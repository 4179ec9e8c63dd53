#!/usr/bin/env python
"""Tail-latency vs batch-window sweep for the serving path (VERDICT r2 #4).

A micro-batching server trades tail latency against `batch_window_ms`:
a longer window fills bigger device batches (throughput) but every request
waits out the window (latency). This driver measures BOTH axes on the real
serving stack: for each window it spawns `bert_tpu.server`, runs soak.py
twice against it — a low-load point (latency floor) and a high-load point
(throughput under contention) — and writes one JSON record per
(window, load) plus a markdown table for docs/PERF.md.

Usage:
  python benchmarks/latency_sweep.py -m /tmp/bench_minilm_l6_q4_0.bin \
      [--windows 0.5 2 8] [--seconds 45] [--out benchmarks/results/...]

The first server start compiles the serving grid (minutes on the tunnel);
SIGTERM writes a warmup manifest that later windows restart from in ~30 s.
"""
import argparse
import json
import os
import signal
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

LOADS = {
    # name → (text clients, framed-batch clients)
    "low": (4, 0),     # near-idle: measures the latency floor + window cost
    "high": (40, 8),   # contention: measures throughput the window buys
}


def run_soak(host, port, clients, batch_clients, seconds):
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "soak.py"),
         "--connect", f"{host}:{port}", "--clients", str(clients),
         "--batch-clients", str(batch_clients), "--seconds", str(seconds)],
        capture_output=True, text=True, timeout=seconds + 300)
    if out.returncode != 0:
        raise RuntimeError(f"soak failed: {out.stderr[-800:]}")
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON in soak output: {out.stdout[-800:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--windows", nargs="+",
                    type=lambda s: s if s == "adaptive" else float(s),
                    default=[0.5, 2, 8, "adaptive"],
                    help="fixed windows in ms and/or 'adaptive' "
                    "(work-conserving continuous batching, the server "
                    "default)")
    ap.add_argument("--seconds", type=int, default=45)
    ap.add_argument("--port", type=int, default=18086)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--manifest", default="/tmp/latency_sweep_manifest.json")
    ap.add_argument("--out", default=os.path.join(
        HERE, "results", "latency_sweep.json"))
    args = ap.parse_args()

    records = []
    for window in args.windows:
        cmd = [sys.executable, "-m", "bert_tpu.server", "-m", args.model,
               "--host", "127.0.0.1", "--port", str(args.port),
               "--max-batch", str(args.max_batch),
               "--batch-window-ms", str(window),
               "--warmup-manifest", args.manifest]
        env = {**os.environ,
               "PYTHONPATH": REPO + os.pathsep +
               os.environ.get("PYTHONPATH", "")}
        proc = subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        try:
            t0 = time.time()
            import socket as _s
            import struct as _st
            while True:
                if proc.poll() is not None:
                    raise RuntimeError("server died during startup")
                try:
                    c = _s.create_connection(("127.0.0.1", args.port),
                                             timeout=2)
                    _st.unpack("<i", c.recv(4))
                    c.close()
                    break
                except OSError:
                    time.sleep(0.5)
                if time.time() - t0 > 1200:
                    raise RuntimeError("server never came up")
            print(f"[window={window}ms] server up in {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
            # low load first: its reservoir is flushed by the high-load run,
            # so each run's server_latency_us reflects its own regime
            for load, (nc, nb) in LOADS.items():
                rec = run_soak("127.0.0.1", args.port, nc, nb, args.seconds)
                rec.update({"window_ms": window, "load": load,
                            "clients": nc, "batch_clients": nb})
                records.append(rec)
                lt = rec["latency_text"] or {"p50_ms": "—", "p99_ms": "—"}
                print(f"[window={window}ms {load}] "
                      f"{rec['sentences_per_sec']}/s "
                      f"text p50/p99 {lt['p50_ms']}/{lt['p99_ms']} ms",
                      file=sys.stderr, flush=True)
        finally:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=180)
            except subprocess.TimeoutExpired:
                proc.kill()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"records": records, "seconds": args.seconds,
                   "max_batch": args.max_batch}, f, indent=1)

    # markdown table for docs/PERF.md — the SAME formatter
    # render_headline.py uses to generate the committed blocks
    sys.path.insert(0, HERE)
    from render_headline import format_sweep_table

    print("\n" + format_sweep_table(records))
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()

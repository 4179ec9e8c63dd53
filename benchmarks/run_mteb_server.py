#!/usr/bin/env python
"""MTEB through the TCP server (counterpart of the reference's
benchmarks/run_mteb_server.py): spawns `python -m bert_tpu.server` as a
subprocess per mode and evaluates via the socket protocol — exercising the
full load → serve → socket → embed path.

Requires the ``mteb`` package (network); degrades with a clear error.
"""
import argparse
import os
import socket
import struct
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = 18085


class SocketModelForMTEB:
    def __init__(self, host="127.0.0.1", port=PORT):
        deadline = time.time() + 600
        while True:
            try:
                self.sock = socket.create_connection((host, port), timeout=600)
                break
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(1)
        (self.n_embd,) = struct.unpack("<i", self._recv(4))

    def _recv(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed")
            buf += chunk
        return buf

    def encode(self, sentences, **kw):
        out = np.empty((len(sentences), self.n_embd), np.float32)
        for i, s in enumerate(sentences):
            self.sock.sendall(s.encode("utf-8")[: (1 << 15) - 1] or b" ")
            out[i] = np.frombuffer(self._recv(self.n_embd * 4), "<f4")
        return out


def run(args) -> None:
    try:
        import mteb
    except ImportError:
        sys.exit("the `mteb` package is not installed (zero-egress sandbox?)")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_root = getattr(args, "out_root", None) or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results")
    port = getattr(args, "port", PORT)
    for mode in args.modes:
        model_path = args.model.format(mode=mode)
        cmd = [sys.executable, "-m", "bert_tpu.server", "-m", model_path,
               "--port", str(port)]
        if getattr(args, "no_warmup", False):
            cmd.append("--no-warmup")
        if getattr(args, "pooling", None):
            cmd += ["--pooling", args.pooling]
        env = {**os.environ,
               # APPEND to PYTHONPATH (replacing it can drop the dir that
               # registers the TPU plugin)
               "PYTHONPATH": repo + os.pathsep
               + os.environ.get("PYTHONPATH", "")}
        proc = subprocess.Popen(cmd, cwd=repo, env=env)
        try:
            model = SocketModelForMTEB(port=port)
            pooling = getattr(args, "pooling", None)
            suffix = f"-{pooling}" if pooling and pooling != "mean" else ""
            out_dir = os.path.join(
                out_root, f"server_{os.path.basename(model_path)}{suffix}")
            evaluation = mteb.MTEB(tasks=mteb.get_tasks(tasks=args.tasks))
            evaluation.run(model, output_folder=out_dir,
                           eval_splits=["test"], overwrite_results=True)
            print(f"[{mode}] results in {out_dir}")
        finally:
            proc.terminate()
            proc.wait()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True, help="ggml-bin per mode, "
                    "e.g. models/all-MiniLM-L6-v2/ggml-model-{mode}.bin")
    ap.add_argument("--modes", nargs="+",
                    default=["q4_0", "q4_1", "f32", "f16"])
    ap.add_argument("--tasks", nargs="+",
                    default=["STSBenchmark", "EmotionClassification"])
    ap.add_argument("--port", type=int, default=PORT)
    ap.add_argument("--no-warmup", action="store_true",
                    help="pass --no-warmup to the spawned server")
    ap.add_argument("--pooling", choices=["mean", "cls"], default=None,
                    help="pass --pooling to the spawned server "
                    "(BGE-family ggml bins need cls)")
    ap.add_argument("--out-root", default=None,
                    help="results root (default: benchmarks/results)")
    run(ap.parse_args())


if __name__ == "__main__":
    main()

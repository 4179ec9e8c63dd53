"""Multi-host scaffolding test (VERDICT r1 #2): a 2-process CPU group over
localhost (Gloo collectives = the DCN stand-in this box allows) runs
sharded inference and a GSPMD train step on the GLOBAL mesh via
bert_tpu.parallel.multihost, matching locally-computed truth.

Spawned as real OS processes — the same code path `init_distributed()`
takes on an actual multi-host pod, minus the TPU runtime's coordinator
autodetection."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_group_inference_and_train():
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO}
    # the workers choose their own backend/device-count env themselves
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(pid), "2", str(port)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-3000:]

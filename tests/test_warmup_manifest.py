"""Warmup manifest (VERDICT r1 weak #5): record the shapes a serving
config actually executes, persist them, and warm exactly those on the
next start — instead of the whole default grid.
"""

import json
import os

import numpy as np

from bert_tpu.engine import BertTPU
from bert_tpu.loader import LoadedModel
from bert_tpu.params import (
    BertConfig,
    params_from_named_tensors,
    random_named_tensors,
)
from fixture_vocab import build_fixture_vocab


def _engine(**kw):
    vocab = build_fixture_vocab()
    cfg = BertConfig(n_vocab=len(vocab), n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    loaded = LoadedModel(
        config=cfg,
        params=params_from_named_tensors(random_named_tensors(cfg, 11), cfg),
        vocab=vocab,
    )
    return BertTPU(loaded, max_batch=16, **kw)


def test_seen_shapes_and_roundtrip(tmp_path):
    eng = _engine()
    eng.encode_batch(["hello world", "the quick brown fox"])
    long = " ".join(["store"] * 50)  # second, longer packed/bucket shape
    eng.encode_batch([long] * 3)
    shapes = eng.seen_shapes()
    assert shapes, "executed batches must be recorded"
    for s in shapes:
        assert set(s) == {"rows", "seq", "kind"}
        assert s["kind"] in ("packed", "bucketed")

    path = str(tmp_path / "manifest.json")
    eng.save_warmup_manifest(path)
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    assert data["shapes"] == shapes  # sorted, deduped

    # a FRESH engine warms exactly the manifest shapes, then serves the
    # same workload without new shape compiles
    eng2 = _engine()
    eng2.warmup(manifest=path)
    warmed = {(s["rows"], s["seq"], s["kind"])
              for s in eng2.seen_shapes()} if eng2.seen_shapes() else set()
    # warmup paths don't tick bucket counters; run the workload and check
    # its shapes are a subset of the manifest
    eng2.encode_batch(["hello world", "the quick brown fox"])
    eng2.encode_batch([long] * 3)
    assert {(s["rows"], s["seq"], s["kind"]) for s in eng2.seen_shapes()} \
        <= {(s["rows"], s["seq"], s["kind"]) for s in data["shapes"]}, warmed

    # embeddings from the manifest-warmed engine match the original
    a = eng.encode_batch(["hello world"])
    b = eng2.encode_batch(["hello world"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_save_merges_existing(tmp_path):
    path = str(tmp_path / "manifest.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"version": 1, "shapes": [
            {"rows": 99, "seq": 64, "kind": "bucketed"}]}, f)
    eng = _engine()
    eng.encode_batch(["hello world"])
    eng.save_warmup_manifest(path)
    with open(path, encoding="utf-8") as f:
        shapes = {(s["rows"], s["seq"]) for s in json.load(f)["shapes"]}
    assert (99, 64) in shapes  # prior run's shape survives
    assert len(shapes) > 1  # plus this run's

    # corrupt manifest: rewritten from scratch, no crash
    with open(path, "w", encoding="utf-8") as f:
        f.write("not json")
    eng.save_warmup_manifest(path)
    with open(path, encoding="utf-8") as f:
        assert json.load(f)["shapes"]


def test_server_flag_writes_manifest(tmp_path):
    """--warmup-manifest on the server: missing file → default warmup +
    write-back on shutdown; present file → manifest warmup."""
    import socket
    import subprocess
    import sys
    import time

    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_file = str(tmp_path / "m.bin")
    from bert_tpu.formats import GgmlHParams, write_ggml
    from fixture_vocab import build_fixture_tokens

    cfg = BertConfig(n_vocab=30522, n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    hp = GgmlHParams(cfg.n_vocab, cfg.n_max_tokens, cfg.n_embd,
                     cfg.n_intermediate, cfg.n_head, cfg.n_layer, ftype=0)
    write_ggml(model_file, hp, build_fixture_tokens(),
               random_named_tensors(cfg, 0))

    manifest = str(tmp_path / "warm.json")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [sys.executable, "-m", "bert_tpu.server", "-m", model_file,
         "--host", "127.0.0.1", "--port", str(port), "--max-batch", "8",
         "--warmup-manifest", manifest],
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        # generous: under full-suite CPU contention the tiny model's
        # default warmup grid can take minutes to compile
        deadline = time.time() + 420
        conn = None
        while time.time() < deadline:
            try:
                conn = socket.create_connection(("127.0.0.1", port),
                                                timeout=2)
                break
            except OSError:
                if proc.poll() is not None:
                    pytest.fail(proc.stdout.read()[-3000:])
                time.sleep(0.5)
        assert conn, "server never came up"
        import struct

        n_embd = struct.unpack("<i", conn.recv(4))[0]
        assert n_embd == 64
        conn.sendall("hello world".encode())
        buf = b""
        while len(buf) < 4 * n_embd:
            chunk = conn.recv(4 * n_embd - len(buf))
            assert chunk
            buf += chunk
        conn.close()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=120)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)
    assert os.path.exists(manifest), "shutdown must write the manifest"
    with open(manifest, encoding="utf-8") as f:
        data = json.load(f)
    assert data["shapes"], data


def test_corrupt_or_mismatched_manifest_falls_back(tmp_path):
    """Review findings (r2): a truncated manifest, a wrong-model manifest,
    or an empty one must fall back to the default warmup grid — never
    crash startup or skip warmup entirely."""
    eng = _engine()

    # truncated/corrupt file
    path = str(tmp_path / "bad.json")
    with open(path, "w", encoding="utf-8") as f:
        f.write('{"shapes": [{"rows": 4,')
    eng.warmup(manifest=path)  # must not raise; runs the default grid

    # different model
    path2 = str(tmp_path / "other_model.json")
    with open(path2, "w", encoding="utf-8") as f:
        json.dump({"model": {"n_embd": 999, "n_layer": 1},
                   "shapes": [{"rows": 4, "seq": 16, "kind": "bucketed"}]},
                  f)
    assert eng._load_manifest_shapes(path2) == []

    # empty shapes
    path3 = str(tmp_path / "empty.json")
    with open(path3, "w", encoding="utf-8") as f:
        json.dump({"version": 1, "shapes": []}, f)
    assert eng._load_manifest_shapes(path3) == []
    eng.warmup(manifest=path3)  # falls back, still warms

    # corrupt-but-parseable seq (or a bigger-n_max_tokens sibling model):
    # must be dropped, not compiled (engine n_max_tokens is 64)
    assert eng._load_manifest_shapes([
        {"rows": 8, "seq": 100000, "kind": "bucketed"},
        {"rows": 8, "seq": 0, "kind": "packed"},
    ]) == []


def test_manifest_rows_rerounded_to_dp(tmp_path):
    """A manifest recorded at dp=1 must stay shardable at dp=2: rows are
    rounded up to the engine's DP degree and clamped to max_batch."""
    import jax

    from bert_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs >= 2 devices")
    vocab = build_fixture_vocab()
    cfg = BertConfig(n_vocab=len(vocab), n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    loaded = LoadedModel(
        config=cfg,
        params=params_from_named_tensors(random_named_tensors(cfg, 11), cfg),
        vocab=vocab,
    )
    eng = BertTPU(loaded, max_batch=16, mesh=make_mesh(2, tp=1))
    shapes = eng._load_manifest_shapes([
        {"rows": 1, "seq": 16, "kind": "bucketed"},
        {"rows": 3, "seq": 64, "kind": "packed"},
        {"rows": 999, "seq": 16, "kind": "bucketed"},  # clamped
    ])
    assert shapes, "re-rounded shapes must survive validation"
    assert all(r % 2 == 0 and r <= 16 for r, _, _ in shapes), shapes
    # round-trip through the dict form warmup(manifest=...) consumes —
    # passing tuples would be silently rejected as malformed
    dict_shapes = [{"rows": r, "seq": s, "kind": k} for r, s, k in shapes]
    assert eng._load_manifest_shapes(dict_shapes) == shapes
    eng.warmup(manifest=dict_shapes)  # executes under the mesh


def test_atomic_manifest_write(tmp_path):
    """save_warmup_manifest writes via tmp+rename — no partial files left."""
    eng = _engine()
    eng.encode_batch(["hello world"])
    path = str(tmp_path / "m.json")
    eng.save_warmup_manifest(path)
    leftovers = [p for p in os.listdir(tmp_path) if p.startswith("m.json.")]
    assert leftovers == []
    with open(path, encoding="utf-8") as f:
        assert json.load(f)["shapes"]

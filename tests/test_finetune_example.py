"""examples/finetune_contrastive.py end to end: TSV pairs → InfoNCE steps
→ .npz weight cache that BertTPU serves (the inference-to-training-to-
inference loop the reference doesn't have)."""

import importlib.util
import logging
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ft():
    spec = importlib.util.spec_from_file_location(
        "finetune_contrastive",
        os.path.join(REPO, "examples", "finetune_contrastive.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dense_model(tmp_path_factory):
    from bert_tpu.formats import GgmlHParams, write_ggml
    from bert_tpu.params import BertConfig, random_named_tensors
    from fixture_vocab import build_fixture_tokens

    cfg = BertConfig(n_vocab=30522, n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    hp = GgmlHParams(cfg.n_vocab, cfg.n_max_tokens, cfg.n_embd,
                     cfg.n_intermediate, cfg.n_head, cfg.n_layer, ftype=0)
    p = str(tmp_path_factory.mktemp("ft") / "dense-f32.bin")
    write_ggml(p, hp, build_fixture_tokens(), random_named_tensors(cfg, 11))
    return p


def test_finetune_then_serve(ft, dense_model, tmp_path):
    logging.disable(logging.WARNING)  # fixture vocab: unknown-token spam
    try:
        out = str(tmp_path / "tuned.npz")
        r = ft.main(["-m", dense_model, "--steps", "8", "--batch", "8",
                     "--seq", "32", "--lr", "1e-3", "--out", out])
    finally:
        logging.disable(logging.NOTSET)
    assert r["last_loss"] < r["first_loss"], r

    from bert_tpu import BertTPU

    m = BertTPU.from_file(out)
    emb = m.encode_batch(["the store", "don't go anywhere"])
    assert emb.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)


def test_finetune_sharded_branch(ft, dense_model, tmp_path):
    """--dp/--tp routes through make_sharded_train_step on the virtual
    8-device mesh; the run completes and writes a loadable cache."""
    logging.disable(logging.WARNING)
    try:
        out = str(tmp_path / "tuned_dp.npz")
        r = ft.main(["-m", dense_model, "--steps", "2", "--batch", "8",
                     "--seq", "32", "--dp", "2", "--tp", "2", "--out", out])
    finally:
        logging.disable(logging.NOTSET)
    assert np.isfinite(r["last_loss"])

    from bert_tpu import BertTPU

    assert BertTPU.from_file(out).encode("the store").shape == (64,)


def test_finetune_rejects_quantized(ft, tmp_path):
    from bert_tpu.formats import GgmlHParams, write_ggml
    from bert_tpu.params import BertConfig, random_named_tensors
    from fixture_vocab import build_fixture_tokens

    cfg = BertConfig(n_vocab=30522, n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    hp = GgmlHParams(cfg.n_vocab, cfg.n_max_tokens, cfg.n_embd,
                     cfg.n_intermediate, cfg.n_head, cfg.n_layer, ftype=2)
    p = str(tmp_path / "q4.bin")
    write_ggml(p, hp, build_fixture_tokens(), random_named_tensors(cfg, 11))
    with pytest.raises(SystemExit, match="quantize"):
        ft.main(["-m", p, "--steps", "1", "--out", str(tmp_path / "x.npz")])

"""Toolchain integration: HF checkpoint dir → convert → quantize → load →
encode, validating the full L2 pipeline offline (random-init torch model)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from bert_tpu.convert import convert_hf_to_ggml, quantize_ggml
from bert_tpu.loader import load_ggml_model, load_hf_model
from bert_tpu.model import bert_forward
from fixture_vocab import build_fixture_tokens

VOCAB_SIZE = 30522


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel

    d = str(tmp_path_factory.mktemp("hf_ckpt"))
    cfg = HFConfig(
        vocab_size=VOCAB_SIZE, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = BertModel(cfg)  # includes pooler — conversion must skip it
    model.save_pretrained(d)
    with open(os.path.join(d, "vocab.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(build_fixture_tokens()) + "\n")
    return d


def test_convert_f32_and_f16(hf_dir, tmp_path):
    out32 = convert_hf_to_ggml(hf_dir, str(tmp_path / "m-f32.bin"), ftype=0)
    out16 = convert_hf_to_ggml(hf_dir, str(tmp_path / "m-f16.bin"), ftype=1)

    m32 = load_ggml_model(out32)
    m16 = load_ggml_model(out16)
    assert m32.config.n_embd == 64 and m32.config.n_layer == 2
    assert len(m32.vocab) == VOCAB_SIZE
    assert m32.vocab.token_to_id["quebec"] == 5447

    # conversion must drop pooler weights (convert-to-ggml.py:86)
    # (they'd fail the loader's expected-name check if present)
    hf = load_hf_model(hf_dir)
    ids = np.array([[101, 5447, 2000, 102]], np.int32)
    mask = np.ones((1, 4), np.float32)
    e_hf = np.asarray(bert_forward(hf.params, jnp.asarray(ids),
                                   jnp.asarray(mask), hf.config))
    e_32 = np.asarray(bert_forward(m32.params, jnp.asarray(ids),
                                   jnp.asarray(mask), m32.config))
    e_16 = np.asarray(bert_forward(m16.params, jnp.asarray(ids),
                                   jnp.asarray(mask), m16.config))
    np.testing.assert_allclose(e_32, e_hf, atol=1e-5)
    # f16 storage noise is small
    assert float((e_32 @ e_16.T).item()) > 0.999


def test_quantize_pipeline(hf_dir, tmp_path):
    out32 = convert_hf_to_ggml(hf_dir, str(tmp_path / "m-f32.bin"), ftype=0)
    logs = []
    stats = quantize_ggml(out32, str(tmp_path / "m-q4_0.bin"), 2,
                          log=logs.append)
    assert stats["total_out"] < 0.35 * stats["total_in"]
    assert any("global code histogram" in ln for ln in logs)

    q = load_ggml_model(str(tmp_path / "m-q4_0.bin"))
    assert q.config.ftype == 2
    m32 = load_ggml_model(out32)
    ids = np.array([[101, 5447, 2000, 1996, 102]], np.int32)
    mask = np.ones((1, 5), np.float32)
    e32 = np.asarray(bert_forward(m32.params, jnp.asarray(ids),
                                  jnp.asarray(mask), m32.config))
    eq = np.asarray(bert_forward(q.params, jnp.asarray(ids),
                                 jnp.asarray(mask), q.config))
    assert float((e32 @ eq.T).item()) > 0.98  # L2-normed cosine


def test_quantize_rejects_quantized_source(hf_dir, tmp_path):
    out32 = convert_hf_to_ggml(hf_dir, str(tmp_path / "m.bin"), ftype=0)
    qp = str(tmp_path / "q.bin")
    quantize_ggml(out32, qp, 2, log=lambda *a: None)
    with pytest.raises(ValueError, match="f32/f16"):
        quantize_ggml(qp, str(tmp_path / "qq.bin"), 3, log=lambda *a: None)


def test_eval_sts_local_spearman():
    import sys
    import tempfile
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "benchmarks"))
    from eval_sts_local import read_pairs, spearman

    a = np.array([1.0, 2.0, 3.0, 4.0])
    assert spearman(a, a) == 1.0
    assert spearman(a, -a) == -1.0
    # ties handled with average ranks
    assert abs(spearman(np.array([1.0, 1.0, 2.0]),
                        np.array([3.0, 3.0, 5.0])) - 1.0) < 1e-12

    tsv = os.path.join(tempfile.mkdtemp(), "pairs.tsv")
    with open(tsv, "w") as f:
        f.write("hello world\thello world\t5.0\n")
        f.write("the store\tgoing home\t1.0\n")
    s1, s2, gold = read_pairs(tsv)
    assert s1 == ["hello world", "the store"] and list(gold) == [5.0, 1.0]


def test_pooling_autodetect_from_st_config(hf_dir):
    """A sentence-transformers 1_Pooling config declaring CLS pooling is
    picked up by the HF-dir loader and resolved by the engine; an explicit
    engine kwarg overrides it."""
    import json
    import shutil

    from bert_tpu.engine import BertTPU

    # without a pooling config: unknown → engine defaults to mean
    assert load_hf_model(hf_dir).pooling is None

    pdir = os.path.join(hf_dir, "1_Pooling")
    os.makedirs(pdir, exist_ok=True)
    try:
        with open(os.path.join(pdir, "config.json"), "w") as f:
            json.dump({"pooling_mode_cls_token": True,
                       "pooling_mode_mean_tokens": False}, f)
        loaded = load_hf_model(hf_dir)
        assert loaded.pooling == "cls"
        assert BertTPU(loaded).pooling == "cls"
        assert BertTPU(loaded, pooling="mean").pooling == "mean"
        with pytest.raises(ValueError):
            BertTPU(loaded, pooling="max")
    finally:
        shutil.rmtree(pdir)

"""W8A8 int8-MXU eval path (bert_tpu/ops/int8_matmul.py).

Pins: codec round trip, matmul vs the f32 oracle, whole-model embedding
quality on top of Q4 (the int8 requantization error must be well inside
the Q4 parity budget), and the engine's threshold routing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bert_tpu.engine import BertTPU
from bert_tpu.loader import LoadedModel
from bert_tpu.model import bert_forward
from bert_tpu.ops.int8_matmul import (
    Int8Tensor,
    dequantize_w8,
    int8_matmul,
    quantize_w8,
)
from bert_tpu.params import (
    BertConfig,
    params_from_named_tensors,
    params_to_int8,
    random_named_tensors,
)
from fixture_vocab import build_fixture_vocab

RNG = np.random.default_rng(11)
CFG = BertConfig(n_vocab=512, n_max_tokens=64, n_embd=64, n_intermediate=128,
                 n_head=4, n_layer=2)


def test_w8_codec_roundtrip():
    w = RNG.standard_normal((128, 96)).astype(np.float32) * 0.05
    it = quantize_w8(w)
    assert it.w_i8.dtype == np.int8 and it.scale.shape == (96,)
    back = dequantize_w8(it)
    # per-column symmetric int8: error ≤ scale/2 per element
    assert np.all(np.abs(back - w) <= it.scale[None, :] * 0.5 + 1e-9)


def test_w8_codec_stacked():
    w = RNG.standard_normal((3, 64, 32)).astype(np.float32)
    it = quantize_w8(w)
    assert it.w_i8.shape == (3, 64, 32) and it.scale.shape == (3, 32)
    back = dequantize_w8(it)
    assert np.abs(back - w).max() < np.abs(w).max() / 127 + 1e-6


def test_int8_matmul_close_to_f32():
    x = RNG.standard_normal((16, 128)).astype(np.float32)
    w = RNG.standard_normal((128, 96)).astype(np.float32) * 0.05
    it = quantize_w8(w)
    y = np.asarray(int8_matmul(jnp.asarray(x), it))
    ref = x @ w
    # both operands carry ≤0.4 % relative error
    scale = np.abs(ref).max()
    assert np.abs(y - ref).max() < 0.02 * scale


@pytest.mark.parametrize("src_ftype", [None, 2, 3])
def test_int8_embeddings_match_source(src_ftype):
    """Embeddings through the int8 tree stay ≫ closer to the source tree
    than the Q4 parity budget (cos > 0.999 vs the tree it derives from)."""
    named = random_named_tensors(CFG, seed=12)
    params = params_from_named_tensors(named, CFG, quantize_ftype=src_ftype)
    params_i8 = params_to_int8(params)

    ids = RNG.integers(0, CFG.n_vocab, size=(4, 24)).astype(np.int32)
    mask = np.ones((4, 24), np.float32)
    base = np.asarray(bert_forward(params, jnp.asarray(ids),
                                   jnp.asarray(mask), CFG))
    i8 = np.asarray(bert_forward(params_i8, jnp.asarray(ids),
                                 jnp.asarray(mask), CFG))
    cos = (base * i8).sum(-1)
    assert cos.min() > 0.999, cos


def test_engine_threshold_routing():
    vocab = build_fixture_vocab()
    cfg = BertConfig(n_vocab=len(vocab), n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    named = random_named_tensors(cfg, seed=13)

    def mk(**kw):
        loaded = LoadedModel(config=cfg,
                             params=params_from_named_tensors(named, cfg),
                             vocab=vocab)
        return BertTPU(loaded, max_batch=8, wire_dtype="f32", **kw)

    # tiny threshold → every batch routes int8; compare against int8 off
    eng_i8 = mk(int8_eval=True, int8_threshold=1)
    eng_f = mk(int8_eval=False)
    assert eng_i8.params_int8 is not None
    assert eng_f.params_int8 is None
    texts = ["hello world", "the quick brown fox", "I'm going to the store",
             "a b c d", "store store", "going going going", "don't",
             "one two three"]
    a = eng_i8.encode_batch(texts)
    b = eng_f.encode_batch(texts)
    cos = (a * b).sum(-1)
    assert cos.min() > 0.999, cos
    # big threshold → int8 tree exists but never routes; exact match
    eng_hi = mk(int8_eval=True, int8_threshold=1 << 30)
    c = eng_hi.encode_batch(texts)
    np.testing.assert_allclose(c, b, atol=1e-6)

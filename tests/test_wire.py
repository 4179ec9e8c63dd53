"""Wire-dtype (device→host result transfer format) correctness.

The engine can gather results as f32 (exact), f16 (lossless relative to the
bf16 compute dtype used on TPU), or int8 fixed-point (unit-norm embeddings
scaled by 127, re-normalized on the host). These tests pin:
  * embeddings across wire dtypes agree to the expected tolerance,
  * downstream cosine-similarity *rankings* — the reference's semantic-search
    use case (examples/sample_dylib.py) and the MTEB STSB metric — are
    preserved.
"""

import numpy as np
import pytest

from bert_tpu.engine import BertTPU
from bert_tpu.loader import LoadedModel
from bert_tpu.params import (
    BertConfig,
    params_from_named_tensors,
    random_named_tensors,
)
from fixture_vocab import build_fixture_vocab, KNOWN_TOKENS

def _model(wire_dtype):
    vocab = build_fixture_vocab()
    cfg = BertConfig(n_vocab=len(vocab), n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    named = random_named_tensors(cfg, seed=3)
    loaded = LoadedModel(
        config=cfg,
        params=params_from_named_tensors(named, cfg),
        vocab=vocab,
    )
    return BertTPU(loaded, max_batch=8, wire_dtype=wire_dtype)


SENTENCES = [
    " ".join(w for w in KNOWN_TOKENS if w.isalpha())[:60],
    "hello world",
    "the quick brown fox",
    "a b c d e f",
]


@pytest.mark.parametrize("wire,atol", [("f16", 2e-3), ("int8", 2e-2)])
def test_wire_dtype_close_to_f32(wire, atol):
    exact = _model("f32").encode_batch(SENTENCES)
    approx = _model(wire).encode_batch(SENTENCES)
    assert approx.dtype == np.float32
    np.testing.assert_allclose(approx, exact, atol=atol)
    # outputs stay unit-norm
    np.testing.assert_allclose(np.linalg.norm(approx, axis=-1), 1.0,
                               atol=1e-3)


@pytest.mark.parametrize("wire", ["f16", "int8"])
def test_wire_dtype_preserves_cosine_ranking(wire):
    """Pairwise cosine similarities move by less than the smallest score gap
    that matters, so top-k retrieval and Spearman rankings are unchanged."""
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((256, 384)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    if wire == "f16":
        wired = emb.astype(np.float16).astype(np.float32)
    else:
        q = np.clip(np.round(emb * 127.0), -127, 127).astype(np.int8)
        wired = q.astype(np.float32)
        wired /= np.linalg.norm(wired, axis=-1, keepdims=True)

    sims_exact = emb @ emb.T
    sims_wired = wired @ wired.T
    err = np.abs(sims_exact - sims_wired).max()
    budget = 5e-4 if wire == "f16" else 2e-2
    assert err < budget, f"max cosine perturbation {err}"


def test_encode_batch_empty_and_degenerate():
    m = _model("f32")
    out = m.encode_batch([])
    assert out.shape == (0, 64)
    # only-unknown characters → just [CLS][SEP]; must embed without error
    out2 = m.encode_batch(["ÿþ", "hello"])
    assert out2.shape == (2, 64) and np.all(np.isfinite(out2))

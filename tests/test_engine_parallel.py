"""Engine-level multi-device execution on the virtual 8-CPU mesh: the
PRODUCT path (BertTPU → eval_tokens → packed + bucketed dispatch) must
reproduce single-device output when given a dp×tp mesh.

This is the serving-path generalization of the reference's single-CPU
pipeline (examples/server.cpp:36 + bert.cpp:952) — the reference has no
distributed axis at all (SURVEY.md §2.6), so parity here is against our own
single-device engine.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bert_tpu.engine import BertTPU
from bert_tpu.loader import LoadedModel
from bert_tpu.params import (
    BertConfig,
    params_from_named_tensors,
    random_named_tensors,
)
from bert_tpu.parallel.mesh import make_mesh
from bert_tpu.vocab import Vocab

# n_embd/tp=64 and n_intermediate/tp=128 at tp=4: Q4-block aligned
CFG = BertConfig(n_vocab=256, n_max_tokens=64, n_embd=256,
                 n_intermediate=512, n_head=4, n_layer=2, ftype=2)

RNG = np.random.default_rng(23)


def _loaded(quantize_ftype=2):
    named = random_named_tensors(CFG, seed=9)
    params = params_from_named_tensors(named, CFG,
                                       quantize_ftype=quantize_ftype)
    vocab = Vocab(tokens=[f"tok{i}" for i in range(CFG.n_vocab)])
    return LoadedModel(config=CFG, params=params, vocab=vocab)


@pytest.fixture(scope="module")
def loaded_q4():
    return _loaded(quantize_ftype=2)


@pytest.fixture(scope="module")
def single_engine(loaded_q4):
    return BertTPU(loaded_q4, compute_dtype=jnp.float32, pack_seq=32)


def _token_lists(lengths):
    return [RNG.integers(0, CFG.n_vocab, size=ln).astype(np.int32).tolist()
            for ln in lengths]


# both packed (≤32) and bucketed (>32) routes
MIXED = [5, 7, 30, 12, 9, 21, 17, 4, 28, 31, 40, 64, 48, 33, 60, 11, 8]


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_engine_sharded_matches_single(loaded_q4, single_engine, dp, tp):
    lists = _token_lists(MIXED)
    ref = single_engine.eval_tokens(lists)

    mesh = make_mesh(dp * tp, tp=tp)
    eng = BertTPU(loaded_q4, compute_dtype=jnp.float32, pack_seq=32,
                  mesh=mesh)
    assert eng._dp == dp and eng._tp == tp
    out = eng.eval_tokens(lists)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)
    # both dispatch routes really ran
    kinds = eng.stats()["buckets"].keys()
    assert any("packed" in k for k in kinds), kinds
    assert any("packed" not in k for k in kinds), kinds


def test_engine_dp_tp_kwargs(loaded_q4, single_engine):
    """dp=/tp= kwargs build the mesh internally (the CLI surface)."""
    lists = _token_lists([6, 13, 44, 27])
    eng = BertTPU(loaded_q4, compute_dtype=jnp.float32, pack_seq=32,
                  dp=2, tp=2)
    out = eng.eval_tokens(lists)
    ref = single_engine.eval_tokens(lists)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-4)


def test_engine_dense_bf16_sharded(single_engine):
    """Dense (unquantized) weights + bf16 compute under the mesh."""
    loaded = _loaded(quantize_ftype=None)
    mesh = make_mesh(8, tp=2)
    eng = BertTPU(loaded, compute_dtype=jnp.bfloat16, pack_seq=32,
                  mesh=mesh, wire_dtype="f32")
    lists = _token_lists([5, 9, 40, 33, 12, 50])
    out = eng.eval_tokens(lists)
    assert out.shape == (6, CFG.n_embd)
    norms = np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def test_engine_int8_sharded(loaded_q4):
    """W8A8 int8 regime under the mesh: per-shard activation scales make
    this approximate, so compare by cosine similarity."""
    mesh = make_mesh(8, tp=2)
    eng = BertTPU(loaded_q4, compute_dtype=jnp.float32, pack_seq=32,
                  mesh=mesh, int8_eval=True, int8_threshold=0)
    ref_eng = BertTPU(loaded_q4, compute_dtype=jnp.float32, pack_seq=32,
                      int8_eval=True, int8_threshold=0)
    lists = _token_lists([6, 18, 44, 29])
    out = eng.eval_tokens(lists)
    ref = ref_eng.eval_tokens(lists)
    cos = np.sum(out * ref, axis=-1)
    assert np.all(cos > 0.999), cos


def test_engine_validation(loaded_q4):
    with pytest.raises(ValueError, match="multiple of dp"):
        BertTPU(loaded_q4, mesh=make_mesh(8, tp=1), max_batch=12)
    with pytest.raises(ValueError, match="multiple of 64"):
        # tp=4 → n_embd/tp = 64 ok, but use a config that violates it
        bad_cfg = BertConfig(n_vocab=256, n_max_tokens=64, n_embd=128,
                             n_intermediate=512, n_head=4, n_layer=2,
                             ftype=2)
        named = random_named_tensors(bad_cfg, seed=1)
        params = params_from_named_tensors(named, bad_cfg, quantize_ftype=2)
        vocab = Vocab(tokens=[f"tok{i}" for i in range(bad_cfg.n_vocab)])
        BertTPU(LoadedModel(config=bad_cfg, params=params, vocab=vocab),
                mesh=make_mesh(8, tp=4))


def test_engine_sharded_warmup(loaded_q4):
    """warmup() rounds its shapes to dp multiples and runs clean."""
    mesh = make_mesh(8, tp=1)
    eng = BertTPU(loaded_q4, compute_dtype=jnp.float32, pack_seq=32,
                  mesh=mesh, max_batch=16,
                  seq_buckets=[32, 64])
    eng.warmup(batch_sizes=[1, 16], max_rows=16)
    out = eng.eval_tokens(_token_lists([10, 44]))
    assert out.shape == (2, CFG.n_embd)

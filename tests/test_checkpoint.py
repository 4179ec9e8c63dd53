"""Weight-cache and train-state checkpoint round-trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from bert_tpu.checkpoint import (
    load_params,
    load_train_state,
    save_params,
    save_train_state,
)
from bert_tpu.model import bert_forward
from bert_tpu.params import (
    BertConfig,
    params_from_named_tensors,
    random_named_tensors,
)
from bert_tpu.quant import QuantTensor

CFG = BertConfig(n_vocab=96, n_max_tokens=32, n_embd=64,
                 n_intermediate=128, n_head=4, n_layer=2, ftype=2)


def test_weight_cache_roundtrip_quantized(tmp_path):
    named = random_named_tensors(CFG, seed=2)
    params = params_from_named_tensors(named, CFG, quantize_ftype=2)
    path = str(tmp_path / "cache.npz")
    save_params(path, params, CFG)
    cfg2, params2 = load_params(path)
    assert cfg2 == CFG
    assert isinstance(params2["layers"]["qkv_w"], QuantTensor)
    np.testing.assert_array_equal(params["layers"]["qkv_w"].packed,
                                  params2["layers"]["qkv_w"].packed)

    ids = np.array([[1, 2, 3, 4]], np.int32)
    mask = np.ones((1, 4), np.float32)
    e1 = np.asarray(bert_forward(params, jnp.asarray(ids),
                                 jnp.asarray(mask), CFG))
    e2 = np.asarray(bert_forward(params2, jnp.asarray(ids),
                                 jnp.asarray(mask), cfg2))
    np.testing.assert_allclose(e1, e2, atol=0)


def test_weight_cache_roundtrip_dense(tmp_path):
    params = params_from_named_tensors(random_named_tensors(CFG, 3), CFG)
    path = str(tmp_path / "dense.npz")
    save_params(path, params, CFG)
    _, params2 = load_params(path)
    for k in params["layers"]:
        np.testing.assert_array_equal(params["layers"][k],
                                      params2["layers"][k])


def test_weight_cache_carries_pooling(tmp_path):
    """A CLS engine's save_cache must reload as CLS (review r4: the cache
    silently reverted CLS models to mean pooling)."""
    from bert_tpu.checkpoint import load_params_and_vocab
    from bert_tpu.engine import BertTPU
    from bert_tpu.loader import LoadedModel
    from bert_tpu.vocab import Vocab

    params = params_from_named_tensors(random_named_tensors(CFG, 5), CFG)
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + \
        [f"tok{i}" for i in range(CFG.n_vocab - 4)]
    loaded = LoadedModel(config=CFG, params=params,
                         vocab=Vocab.from_tokens(tokens), pooling="cls")
    eng = BertTPU(loaded)
    assert eng.pooling == "cls"
    path = str(tmp_path / "cls.npz")
    eng.save_cache(path)
    _, _, _, pooling = load_params_and_vocab(path)
    assert pooling == "cls"
    assert BertTPU.from_file(path).pooling == "cls"
    # explicit override still wins over the stored property
    assert BertTPU.from_file(path, pooling="mean").pooling == "mean"
    # files that predate the field load as unknown → engine defaults mean
    save_params(str(tmp_path / "old.npz"), params, CFG, vocab_tokens=tokens)
    assert BertTPU.from_file(str(tmp_path / "old.npz")).pooling == "mean"


def test_train_state_roundtrip(tmp_path):
    from bert_tpu.train import init_train_state, make_optimizer, make_train_step

    params = params_from_named_tensors(random_named_tensors(CFG, 4), CFG)
    opt = make_optimizer(1e-3)
    state = init_train_state(params, opt)
    step = make_train_step(CFG, opt)
    rng = np.random.default_rng(0)
    batch = {
        "ids_a": jnp.asarray(rng.integers(0, CFG.n_vocab, (4, 8),
                                          dtype=np.int32)),
        "mask_a": jnp.ones((4, 8), jnp.float32),
        "ids_b": jnp.asarray(rng.integers(0, CFG.n_vocab, (4, 8),
                                          dtype=np.int32)),
        "mask_b": jnp.ones((4, 8), jnp.float32),
    }
    state, _ = step(state, batch)
    ckpt = str(tmp_path / "ckpt")
    save_train_state(ckpt, state)
    restored = load_train_state(ckpt, state)
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(restored.params["layers"]["qkv_w"]),
        np.asarray(state.params["layers"]["qkv_w"]), atol=0)
    # resumed state continues training
    state2, metrics = step(restored, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 2


def test_engine_weight_cache_roundtrip(tmp_path):
    """BertTPU.save_cache → from_file(.npz): same embeddings, vocab intact."""
    from bert_tpu.engine import BertTPU
    from bert_tpu.loader import LoadedModel
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixture_vocab import build_fixture_vocab

    loaded = LoadedModel(
        config=CFG,
        params=params_from_named_tensors(random_named_tensors(CFG, 6), CFG,
                                         quantize_ftype=2),
        vocab=build_fixture_vocab(),
    )
    m1 = BertTPU(loaded)
    path = str(tmp_path / "model.npz")
    m1.save_cache(path)
    m2 = BertTPU.from_file(path)
    assert m2.tokenize("Québec") == [101, 5447, 102]
    e1 = m1.encode_batch(["the store", "go"])
    e2 = m2.encode_batch(["the store", "go"])
    np.testing.assert_allclose(e1, e2, atol=1e-6)


def test_sharded_placement_preserves_opt_state():
    """make_sharded_train_step must NOT reset restored optimizer moments
    (re-initializing mu/nu silently breaks checkpoint resume)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bert_tpu.parallel.mesh import make_mesh
    from bert_tpu.params import (BertConfig, params_from_named_tensors,
                                 random_named_tensors)
    from bert_tpu.train import (init_train_state, make_optimizer,
                                make_sharded_train_step)

    cfg = BertConfig(n_vocab=64, n_max_tokens=32, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    params = params_from_named_tensors(random_named_tensors(cfg, 3), cfg)
    opt = make_optimizer()
    state = init_train_state(params, opt)
    # simulate a restored state with non-zero moments and step
    fake_mu = jax.tree_util.tree_map(
        lambda x: np.full_like(np.asarray(x), 0.25), state.opt_state[0].mu)
    restored = state._replace(
        opt_state=(state.opt_state[0]._replace(
            mu=fake_mu, count=jnp.int32(7)),) + tuple(state.opt_state[1:]),
        step=jnp.int32(7),
    )
    mesh = make_mesh(8, tp=2)
    placed, _ = make_sharded_train_step(mesh, cfg, opt, restored)
    mu_leaf = np.asarray(
        jax.tree_util.tree_leaves(placed.opt_state[0].mu)[0])
    assert np.allclose(mu_leaf, 0.25), "restored mu was reset"
    assert int(placed.opt_state[0].count) == 7

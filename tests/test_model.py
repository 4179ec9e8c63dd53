"""Forward-pass correctness: parity vs HuggingFace torch BertModel (random
init — no network), masking, quantized-path quality, scan/stacking sanity.

This replaces the reference's "MTEB-as-correctness" strategy (SURVEY.md §4)
with a deterministic oracle: a torch BertModel with identical weights, mean
pooling and L2 normalization must agree with our jitted forward to fp32
tolerance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bert_tpu.model import bert_forward, mean_pool_l2
from bert_tpu.params import (
    BertConfig,
    params_from_named_tensors,
    random_named_tensors,
)

CFG = BertConfig(
    n_vocab=96, n_max_tokens=64, n_embd=64, n_intermediate=128,
    n_head=4, n_layer=3,
)

RNG = np.random.default_rng(7)


def _random_batch(cfg, b=4, tmax=None):
    tmax = tmax or cfg.n_max_tokens
    lens = RNG.integers(3, tmax, size=b)
    ids = np.zeros((b, tmax), np.int32)
    mask = np.zeros((b, tmax), np.float32)
    for r, ln in enumerate(lens):
        ids[r, :ln] = RNG.integers(0, cfg.n_vocab, size=ln)
        mask[r, :ln] = 1
    return ids, mask


@pytest.fixture(scope="module")
def named():
    return random_named_tensors(CFG, seed=3)


@pytest.fixture(scope="module")
def params(named):
    return params_from_named_tensors(named, CFG)


def test_output_shape_and_norm(params):
    ids, mask = _random_batch(CFG)
    out = bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    assert out.shape == (4, CFG.n_embd)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5
    )


def test_torch_parity(named, params):
    """Bit-level architecture check vs transformers.BertModel with the SAME
    weights: embeddings→L layers→mean-pool→L2 within fp32 tolerance."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel

    hf_cfg = HFConfig(
        vocab_size=CFG.n_vocab, hidden_size=CFG.n_embd,
        num_hidden_layers=CFG.n_layer, num_attention_heads=CFG.n_head,
        intermediate_size=CFG.n_intermediate,
        max_position_embeddings=CFG.n_max_tokens,
        hidden_act="gelu", layer_norm_eps=CFG.layer_norm_eps,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = BertModel(hf_cfg, add_pooling_layer=False)
    sd = hf.state_dict()
    with torch.no_grad():
        for name, tensor in sd.items():
            if name in named:
                tensor.copy_(torch.from_numpy(named[name]))
    hf.eval()

    ids, mask = _random_batch(CFG, b=3, tmax=32)
    with torch.no_grad():
        hidden = hf(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    m = mask[..., None]
    pooled = (hidden * m).sum(1) / np.maximum(m.sum(1), 1)
    ref = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    out = np.asarray(
        bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)

    # CLS pooling (BGE-family checkpoints) against the same torch hidden
    # states: normalized first-token vector
    cls_ref = hidden[:, 0]
    cls_ref = cls_ref / np.linalg.norm(cls_ref, axis=-1, keepdims=True)
    cls_out = np.asarray(
        bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG,
                     pooling="cls")
    )
    np.testing.assert_allclose(cls_out, cls_ref, atol=2e-5, rtol=1e-4)


def test_padding_invariance(params):
    """Extending padding must not change embeddings (mask correctness)."""
    ids, mask = _random_batch(CFG, b=2, tmax=24)
    out1 = bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    ids2 = np.zeros((2, 48), np.int32)
    mask2 = np.zeros((2, 48), np.float32)
    ids2[:, :24], mask2[:, :24] = ids, mask
    out2 = bert_forward(params, jnp.asarray(ids2), jnp.asarray(mask2), CFG)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_batch_invariance(params):
    """Row i of a batch equals encoding row i alone (real batching, unlike
    the reference's serial loop)."""
    ids, mask = _random_batch(CFG, b=4, tmax=32)
    full = np.asarray(
        bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    )
    for r in range(4):
        one = np.asarray(
            bert_forward(params, jnp.asarray(ids[r:r + 1]),
                         jnp.asarray(mask[r:r + 1]), CFG)
        )
        np.testing.assert_allclose(full[r], one[0], atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("ftype", [2, 3])
def test_quantized_close_to_f32(named, params, ftype):
    """Weight-only Q4 embeddings stay close to f32 (SURVEY.md §6 parity
    budget: quantization noise is sub-point on cosine metrics)."""
    qparams = params_from_named_tensors(named, CFG, quantize_ftype=ftype)
    ids, mask = _random_batch(CFG, b=4)
    f32 = np.asarray(
        bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    )
    q4 = np.asarray(
        bert_forward(qparams, jnp.asarray(ids), jnp.asarray(mask), CFG)
    )
    cos = (f32 * q4).sum(-1)  # both L2-normalized
    assert cos.min() > 0.99, f"cosine {cos}"


def test_jit_consistency(params):
    ids, mask = _random_batch(CFG, b=2)
    f = jax.jit(lambda p, i, m: bert_forward(p, i, m, CFG))
    out_jit = np.asarray(f(params, jnp.asarray(ids), jnp.asarray(mask)))
    out_eager = np.asarray(
        bert_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG)
    )
    np.testing.assert_allclose(out_jit, out_eager, atol=1e-6)


def test_mean_pool_l2_masked():
    x = jnp.asarray(RNG.standard_normal((2, 4, 8)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], dtype=jnp.float32)
    out = np.asarray(mean_pool_l2(x, mask))
    xm = np.asarray(x)
    ref0 = xm[0, :2].mean(0)
    ref0 /= np.linalg.norm(ref0)
    np.testing.assert_allclose(out[0], ref0, atol=1e-6)


def test_remat_gradients_match(params):
    """jax.checkpoint on the scanned layer must not change gradients."""
    ids, mask = _random_batch(CFG, b=2)
    di, dm = jnp.asarray(ids), jnp.asarray(mask)

    def loss(p, remat):
        emb = bert_forward(p, di, dm, CFG, remat=remat)
        return jnp.sum(emb * emb[::-1])

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5),
        g_plain, g_remat)

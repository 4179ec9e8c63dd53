"""COMPILED Pallas kernel parity gate on a real TPU chip (VERDICT r1 #4).

Interpret-mode tests (tests/test_kernels.py) cannot catch Mosaic lowering
bugs; this module runs every kernel through the actual Mosaic compiler at
model-realistic shapes and checks it against the same jnp oracles.

Run as its OWN pytest invocation (the default conftest forces the CPU
backend otherwise):

    BERT_TPU_REAL_TPU=1 python -m pytest tests/test_kernels_tpu.py -q

The verify skill re-runs this every round.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="needs a real TPU (BERT_TPU_REAL_TPU=1)"),
]

RNG = np.random.default_rng(17)


# -- Q4 fused dequant+matmul: both ftypes, MiniLM + bert-base shapes -------
@pytest.mark.parametrize("ftype", [2, 3])
@pytest.mark.parametrize("m,k,n", [(128, 384, 384), (512, 384, 1536),
                                   (200, 768, 768)])
def test_q4_matmul_compiled(ftype, m, k, n):
    from bert_tpu.ops.q4_matmul import _q4_matmul_jnp, _q4_matmul_pallas
    from bert_tpu.quant import quantize_tensor_tpu

    w = (RNG.standard_normal((k, n)) * 0.02).astype(np.float32)
    x = jnp.asarray(RNG.standard_normal((m, k)).astype(np.float32))
    qt = quantize_tensor_tpu(w, ftype)
    ref = np.asarray(_q4_matmul_jnp(x, qt))
    out = np.asarray(_q4_matmul_pallas(
        x, jnp.asarray(qt.packed), jnp.asarray(qt.scales),
        None if qt.mins is None else jnp.asarray(qt.mins)))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


# -- fused QKV-attention: padding bias and packed block bias, f32 + bf16 ---
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("b,t,h,dh,pairwise", [
    (16, 128, 12, 32, False),   # MiniLM shape, padding mask [B, T]→bias
    (8, 64, 12, 64, True),      # bert-base head dim, packed [B, T, T] bias
    (4, 512, 12, 32, False),    # longest bucket
    (4, 512, 16, 64, False),    # bge-large longest → head-chunked grid
    (4, 512, 12, 64, False),    # bert-base longest → head-chunked grid
    (8, 64, 16, 64, True),      # bge-large class, packed bias
    (4, 512, 16, 32, False),    # table-False whole-kernel: the probe
                                # routes it to a verified head chunk
                                # (ops/mosaic_probe.py, round 3)
])
def test_fused_qkv_attention_compiled(dtype, b, t, h, dh, pairwise):
    from bert_tpu.ops.attention import _mha_jnp
    from bert_tpu.ops.fused_attention import (
        fused_qkv_attention,
        pick_head_chunk,
    )

    head_chunk = pick_head_chunk(t, h, dh, dtype)
    if head_chunk is None:
        pytest.skip("no fused configuration inside the measured Mosaic "
                    "compile envelope — the model routes this shape to "
                    "the per-(b,h) kernel (tested below)")

    d = h * dh
    qkv_f32 = RNG.standard_normal((b, t, 3 * d)).astype(np.float32)
    if pairwise:
        halves = (np.arange(t) >= t // 2).astype(np.int32)
        same = halves[:, None] == halves[None, :]
        bias = jnp.asarray(np.where(same, 0.0, -1e9).astype(np.float32)
                           [None].repeat(b, 0))
    else:
        mask = (RNG.random((b, t)) > 0.2).astype(np.float32)
        mask[:, 0] = 1.0
        bias = jnp.asarray((mask - 1.0) * 1e9)
    qkv = jnp.asarray(qkv_f32).astype(dtype)
    scale = 1.0 / dh ** 0.5
    out = np.asarray(fused_qkv_attention(
        qkv, bias, n_head=h, d_head=dh, scale=scale,
        head_chunk=head_chunk).astype(jnp.float32))

    q5 = np.asarray(qkv.astype(jnp.float32)
                    ).reshape(b, t, h, 3, dh).transpose(0, 2, 3, 1, 4)
    q, k, v = (jnp.asarray(q5[:, :, i]) for i in range(3))
    ref = np.asarray(_mha_jnp(q, k, v, bias, scale))
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, d)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-4
    np.testing.assert_allclose(out, ref, atol=tol, rtol=tol)


# -- per-(b,h) attention kernel (long-T / outside-fused-envelope path) -----
@pytest.mark.parametrize("b,h,t,dh", [
    (4, 12, 512, 32),   # MiniLM longest bucket
    (2, 16, 512, 64),   # bge-large longest bucket (fused-envelope fallback)
])
def test_mha_pallas_compiled(b, h, t, dh):
    from bert_tpu.ops.attention import _mha_jnp, _mha_pallas

    q = jnp.asarray(RNG.standard_normal((b, h, t, dh)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, h, t, dh)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, h, t, dh)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[:, 400:] = 0
    bias = jnp.asarray((mask - 1.0) * 1e9)
    scale = 1.0 / dh ** 0.5
    ref = np.asarray(_mha_jnp(q, k, v, bias, scale))
    out = np.asarray(_mha_pallas(q, k, v, bias, scale))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


# -- fused LayerNorm: all epilogue variants, f32 and bf16 ------------------
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("m,d,residual,pre_bias", [
    (2048, 384, False, False),
    (2048, 384, True, False),
    (1024, 768, True, True),
    # packed bge-large epilogue: at f32 this shape needs ~20 MB of VMEM
    # under the old fixed tm=1024 and Mosaic refused the compile (round-5
    # sweep); _pick_tile_m must halve the row tile so it fits
    (12288, 1024, True, True),
])
def test_fused_layer_norm_compiled(dtype, m, d, residual, pre_bias):
    from bert_tpu.ops.layer_norm import _ln_pallas, layer_norm_jnp

    x = jnp.asarray(RNG.standard_normal((m, d)).astype(np.float32)
                    ).astype(dtype)
    r = (jnp.asarray(RNG.standard_normal((m, d)).astype(np.float32)
                     ).astype(dtype) if residual else None)
    pb = (jnp.asarray(RNG.standard_normal(d).astype(np.float32))
          if pre_bias else None)
    scale = jnp.asarray(RNG.standard_normal(d).astype(np.float32))
    bias = jnp.asarray(RNG.standard_normal(d).astype(np.float32))
    args = (x, scale, bias, 1e-12, r) + ((pb,) if pre_bias else ())
    ref = np.asarray(layer_norm_jnp(*args).astype(jnp.float32))
    out = np.asarray(_ln_pallas(*args).astype(jnp.float32))
    tol = 3e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(out, ref, atol=tol, rtol=tol)


# -- whole-model compiled-vs-oracle (ties the kernels together) ------------
def test_model_forward_pallas_vs_xla_compiled():
    """bert_forward with use_pallas=True vs use_pallas=False on-chip, f32
    compute: the kernel path must match XLA's within fp tolerance."""
    from bert_tpu.model import bert_forward
    from bert_tpu.params import (
        BertConfig,
        params_from_named_tensors,
        random_named_tensors,
    )

    cfg = BertConfig(n_vocab=1024, n_max_tokens=128, n_embd=384,
                     n_intermediate=1536, n_head=12, n_layer=2)
    params = params_from_named_tensors(random_named_tensors(cfg, seed=2),
                                       cfg, quantize_ftype=2)
    ids = jnp.asarray(RNG.integers(0, 1024, size=(8, 128), dtype=np.int32))
    mask = np.ones((8, 128), np.float32)
    mask[:, 100:] = 0
    mask = jnp.asarray(mask)
    a = np.asarray(bert_forward(params, ids, mask, cfg,
                                compute_dtype=jnp.float32, use_pallas=True))
    b = np.asarray(bert_forward(params, ids, mask, cfg,
                                compute_dtype=jnp.float32, use_pallas=False))
    cos = np.sum(a * b, axis=-1)
    assert np.all(cos > 0.9999), cos.min()
    np.testing.assert_allclose(a, b, atol=5e-3)

    # longest bucket at f32: routes to the head-chunked fused kernel
    # (pick_head_chunk(512, 12, 32, f32) == 4)
    cfg512 = BertConfig(**{**cfg.__dict__, "n_max_tokens": 512})
    params512 = params_from_named_tensors(
        random_named_tensors(cfg512, seed=2), cfg512, quantize_ftype=2)
    ids = jnp.asarray(RNG.integers(0, 1024, size=(2, 512), dtype=np.int32))
    mask = jnp.ones((2, 512), jnp.float32)
    a = np.asarray(bert_forward(params512, ids, mask, cfg512,
                                compute_dtype=jnp.float32, use_pallas=True))
    b = np.asarray(bert_forward(params512, ids, mask, cfg512,
                                compute_dtype=jnp.float32, use_pallas=False))
    assert np.all(np.sum(a * b, axis=-1) > 0.9999)

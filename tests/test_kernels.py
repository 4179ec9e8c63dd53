"""Pallas kernel tests in interpreter mode against jnp oracles
(SURVEY.md §4: kernel-vs-jnp reference checks). Compiled-mode validation
happens on real TPU via bench.py / the verify drive."""

import numpy as np
import pytest

import jax.numpy as jnp

from bert_tpu.ops.attention import _mha_jnp, _mha_pallas
from bert_tpu.ops.q4_matmul import (
    _q4_matmul_jnp,
    _q4_matmul_pallas,
    q4_dequantize_jnp,
)
from bert_tpu.quant import dequantize_tpu, quantize_tensor_tpu

RNG = np.random.default_rng(3)


@pytest.mark.parametrize("ftype", [2, 3])
def test_jnp_dequant_matches_numpy(ftype):
    w = RNG.standard_normal((256, 128)).astype(np.float32)
    qt = quantize_tensor_tpu(w, ftype)
    np.testing.assert_allclose(
        np.asarray(q4_dequantize_jnp(qt)), dequantize_tpu(qt),
        atol=1e-6, rtol=1e-5,
    )


@pytest.mark.parametrize("ftype", [2, 3])
@pytest.mark.parametrize("m,k,n", [(8, 128, 128), (200, 256, 384)])
def test_q4_matmul_pallas_vs_jnp(ftype, m, k, n):
    """Interpreted kernel output must match the dequant-then-dot oracle,
    including M/N shapes that need padding to tile boundaries."""
    w = RNG.standard_normal((k, n)).astype(np.float32)
    x = jnp.asarray(RNG.standard_normal((m, k)).astype(np.float32))
    qt = quantize_tensor_tpu(w, ftype)
    ref = np.asarray(_q4_matmul_jnp(x, qt))
    out = np.asarray(_q4_matmul_pallas(
        x, jnp.asarray(qt.packed), jnp.asarray(qt.scales),
        None if qt.mins is None else jnp.asarray(qt.mins),
        interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_q4_matmul_quantization_error_bounded():
    """End-to-end: q4 matmul vs exact f32 matmul has small relative error."""
    k, n, m = 384, 384, 64
    w = (RNG.standard_normal((k, n)) * 0.02).astype(np.float32)
    x = jnp.asarray(RNG.standard_normal((m, k)).astype(np.float32))
    qt = quantize_tensor_tpu(w, 2)
    exact = np.asarray(x) @ w
    q = np.asarray(_q4_matmul_jnp(x, qt))
    rel = np.abs(q - exact).mean() / (np.abs(exact).mean() + 1e-9)
    # Q4_0 per-weight noise is ~amax/14 ≈ 0.2σ for gaussian weights; the
    # noise-to-signal ratio of the matmul is K-independent (~10%). Real
    # checkpoints fare much better (see test_model quantized-cosine > 0.99).
    assert rel < 0.15, rel


def test_mha_pallas_vs_jnp():
    b, h, t, dh = 2, 4, 64, 32
    q = jnp.asarray(RNG.standard_normal((b, h, t, dh)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, h, t, dh)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, h, t, dh)).astype(np.float32))
    mask = np.ones((b, t), np.float32)
    mask[:, t // 2:] = 0
    bias = jnp.asarray((mask - 1.0) * 1e9)
    scale = 1.0 / dh ** 0.5
    ref = np.asarray(_mha_jnp(q, k, v, bias, scale))
    out = np.asarray(_mha_pallas(q, k, v, bias, scale, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_mha_masked_keys_have_no_influence():
    """Changing K/V at masked positions must not change the output."""
    b, h, t, dh = 1, 2, 32, 16
    q = jnp.asarray(RNG.standard_normal((b, h, t, dh)).astype(np.float32))
    k = RNG.standard_normal((b, h, t, dh)).astype(np.float32)
    v = RNG.standard_normal((b, h, t, dh)).astype(np.float32)
    mask = np.ones((b, t), np.float32)
    mask[:, 20:] = 0
    bias = jnp.asarray((mask - 1.0) * 1e9)
    scale = 1.0 / dh ** 0.5
    out1 = np.asarray(_mha_jnp(q, jnp.asarray(k), jnp.asarray(v), bias, scale))
    k[:, :, 20:] = 99.0
    v[:, :, 20:] = -99.0
    out2 = np.asarray(_mha_jnp(q, jnp.asarray(k), jnp.asarray(v), bias, scale))
    np.testing.assert_allclose(out1[:, :, :20], out2[:, :, :20], atol=1e-5)


@pytest.mark.parametrize("m,d,residual", [(8, 64, False), (100, 384, True),
                                          (1024, 384, False),
                                          (1040, 1024, True)])
def test_fused_layer_norm_vs_jnp(m, d, residual):
    from bert_tpu.ops.layer_norm import _ln_pallas, layer_norm_jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    r = (jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
         if residual else None)
    scale = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    ref = np.asarray(layer_norm_jnp(x, scale, bias, 1e-12, r))
    out = np.asarray(_ln_pallas(x, scale, bias, 1e-12, r, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_fused_layer_norm_bf16_io():
    from bert_tpu.ops.layer_norm import _ln_pallas, layer_norm_jnp

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    ref = np.asarray(layer_norm_jnp(x, scale, bias, 1e-12).astype(jnp.float32))
    out = np.asarray(_ln_pallas(x, scale, bias, 1e-12, None,
                                interpret=True).astype(jnp.float32))
    np.testing.assert_allclose(out, ref, atol=2e-2)


@pytest.mark.parametrize("b,t,h,dh,pairwise,group,head_chunk", [
    (4, 16, 4, 32, False, 2, None),
    (3, 16, 4, 32, False, 2, None),  # b not a multiple of group → padded
    (2, 32, 2, 16, True, 1, None),
    (5, 8, 3, 8, True, 2, None),
    (4, 16, 4, 32, False, 2, 2),     # head-chunked grid (2 chunks)
    (3, 16, 4, 32, False, 2, 1),     # one head per grid step
    (2, 32, 6, 16, True, 1, 3),      # chunked + pairwise bias
])
def test_fused_qkv_attention_vs_jnp(b, t, h, dh, pairwise, group,
                                    head_chunk):
    from bert_tpu.ops.attention import _mha_jnp
    from bert_tpu.ops.fused_attention import fused_qkv_attention

    rng = np.random.default_rng(0)
    d = h * dh
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * d)).astype(np.float32))
    if pairwise:
        # block mask: forbid attention between first and second half
        halves = (np.arange(t) >= t // 2).astype(np.int32)
        same = halves[:, None] == halves[None, :]
        bias = jnp.asarray(np.where(same, 0.0, -1e9).astype(np.float32)
                           [None].repeat(b, 0))
    else:
        mask = (rng.random((b, t)) > 0.2).astype(np.float32)
        mask[:, 0] = 1.0
        bias = jnp.asarray((mask - 1.0) * 1e9)

    out = np.asarray(fused_qkv_attention(
        qkv, bias, n_head=h, d_head=dh, scale=0.3, group=group,
        head_chunk=head_chunk, interpret=True))

    # oracle: split heads the slow way, einsum attention
    q5 = np.asarray(qkv).reshape(b, t, h, 3, dh).transpose(0, 2, 3, 1, 4)
    q, k, v = (jnp.asarray(q5[:, :, i]) for i in range(3))
    ref = np.asarray(_mha_jnp(q, k, v, bias, 0.3))  # [B, H, T, dh]
    ref = ref.transpose(0, 2, 1, 3).reshape(b, t, d)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_fused_layer_norm_pre_bias():
    from bert_tpu.ops.layer_norm import _ln_pallas, layer_norm_jnp

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32))
    pb = jnp.asarray(rng.standard_normal(96).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(96).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(96).astype(np.float32))
    ref = np.asarray(layer_norm_jnp(x, scale, bias, 1e-12, r, pb))
    out = np.asarray(_ln_pallas(x, scale, bias, 1e-12, r, pb,
                                interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_fused_attn_envelope_policy():
    """Routing policy vs the measured v5e Mosaic compile envelope
    (ops/fused_attention.fused_attn_supported): every measured-FAIL shape
    must route to the per-(b,h) kernel; the common model shapes must stay
    fused."""
    import jax.numpy as jnp

    from bert_tpu.ops.fused_attention import fused_attn_supported

    # measured Mosaic compile FAILURES (bf16) — must be outside the envelope
    for (t, h, dh) in [(512, 12, 64), (512, 16, 64), (512, 16, 32),
                       (512, 24, 64), (384, 24, 64), (256, 32, 64)]:
        assert not fused_attn_supported(t, h, dh, jnp.bfloat16), (t, h, dh)

    # the shapes real models serve — must stay fused (all measured OK)
    for (t, h, dh) in [(64, 12, 32), (128, 12, 32), (512, 12, 32),  # MiniLM
                       (64, 12, 64), (128, 12, 64), (384, 12, 64),  # base
                       (64, 16, 64), (256, 16, 64), (384, 16, 64)]:  # bge-l
        assert fused_attn_supported(t, h, dh, jnp.bfloat16), (t, h, dh)

    # f32: halved envelope, MiniLM short buckets still fused
    assert fused_attn_supported(128, 12, 32, jnp.float32)
    assert fused_attn_supported(256, 12, 32, jnp.float32)
    assert not fused_attn_supported(512, 12, 32, jnp.float32)
    assert not fused_attn_supported(256, 16, 64, jnp.float32)

    # ... but f32 long-T recovers the fused path via head chunking
    # (measured on-chip: compiles in 1-3 s, oracle match ~3e-7)
    from bert_tpu.ops.fused_attention import pick_head_chunk

    assert pick_head_chunk(512, 12, 32, jnp.float32) == 4   # MiniLM 512
    assert pick_head_chunk(512, 12, 64, jnp.float32) == 2   # bert-base 512
    assert pick_head_chunk(512, 16, 64, jnp.float32) == 2   # bge-large 512


def test_pick_head_chunk_policy():
    """Shapes outside the whole-kernel envelope must find a head-chunked
    fused configuration (lane block % 128) instead of losing the fused
    path entirely."""
    import jax.numpy as jnp

    from bert_tpu.ops.fused_attention import pick_head_chunk

    # inside the envelope → whole kernel
    assert pick_head_chunk(512, 12, 32, jnp.bfloat16) == 12   # MiniLM
    assert pick_head_chunk(128, 16, 64, jnp.bfloat16) == 16   # bge short

    # outside → a chunk: divisor of H with 3·dh·hc % 128 == 0
    hc = pick_head_chunk(512, 16, 64, jnp.bfloat16)           # bge 512
    assert hc is not None and 16 % hc == 0 and (3 * 64 * hc) % 128 == 0
    hc = pick_head_chunk(512, 12, 64, jnp.bfloat16)           # base 512
    assert hc is not None and 12 % hc == 0 and (3 * 64 * hc) % 128 == 0
    hc = pick_head_chunk(512, 16, 32, jnp.bfloat16)
    assert hc is not None and (3 * 32 * hc) % 128 == 0        # hc ∈ {4, 8}

    # odd head dims with no 128-lane-aligned divisor → per-(b,h) fallback
    assert pick_head_chunk(512, 12, 40, jnp.bfloat16) is None


def test_ln_tile_picker_budgets():
    """_pick_tile_m keeps the per-tile VMEM working set under budget and
    leaves small/narrow shapes at the full tile (round-5 regression: the
    f32 D=1024 residual+pre_bias LN OOM'd Mosaic's scoped VMEM)."""
    from bert_tpu.ops.layer_norm import _pick_tile_m

    budget = 12 * 1024 * 1024
    for d, itemsize, n_in in [(384, 2, 2), (384, 4, 2), (768, 2, 2),
                              (768, 4, 2), (1024, 2, 2), (1024, 4, 2),
                              (1024, 4, 1)]:
        tm = _pick_tile_m(d, itemsize, n_in, 1024)
        per_row = d * (itemsize * (n_in + 1) + 8)
        assert tm * per_row <= budget, (d, itemsize, n_in, tm)
        assert tm >= 8
    # the MiniLM hot shape keeps the full tile (no perf change)
    assert _pick_tile_m(384, 2, 2, 1024) == 1024
    # the shape that OOM'd gets halved
    assert _pick_tile_m(1024, 4, 2, 1024) == 512

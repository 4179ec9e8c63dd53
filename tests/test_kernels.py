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

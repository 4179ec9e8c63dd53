"""Fused INT4-dequant + matmul for the MXU.

The TPU-native replacement for ggml's q4×f32 ``ggml_mul_mat`` kernels (the
reference's only quantized op, SURVEY.md §2.3): weight-only block-quantized
INT4 weights are kept packed in HBM/VMEM and dequantized on the fly inside a
Pallas kernel, feeding the MXU with bf16/f32 tiles. This trades a little VPU
work for a 4-8× cut in weight-side HBM traffic — the right trade on TPU,
where matmuls at small batch are HBM-bandwidth-bound.

Layout (see bert_tpu/quant.py): logical ``W[K, N]``,
  * ``packed[K//2, N]`` uint8 — GROUP-LOCAL half-split nibbles: within each
    64-row group, low nibbles = the group's first 32 rows, high nibbles =
    its last 32, so in-kernel unpack is a per-group sublane-band
    concatenate (no interleave shuffles) and K-shards cut at 64-row
    granularity stay valid;
  * ``scales[K//32, N]`` (+ ``mins[K//32, N]`` for Q4_1) broadcast over a
    [K//32, 32, N] view — pure VPU broadcasting, no gathers.

A jnp reference path (dequantize-then-dot, XLA-fused) backs the kernel for
CPU tests and serves as the correctness oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import QK, QuantTensor
from .common import f32_precision, round_up as _round_up


# ---------------------------------------------------------------------------
# jnp reference path
# ---------------------------------------------------------------------------

def _unpack_codes3(packed) -> jax.Array:
    """[K//2, N] group-local packed bytes → [K//QK, QK, N] int32 codes
    (block-major view, aligned with the scales planes)."""
    half, n = packed.shape
    p = packed.astype(jnp.int32).reshape(half // QK, QK, n)
    # group g: low nibbles = q4 block 2g, high nibbles = block 2g+1
    return jnp.concatenate([p & 0xF, p >> 4], axis=1).reshape(
        half * 2 // QK, QK, n
    )


def q4_dequantize_jnp(qt: QuantTensor, dtype=jnp.float32) -> jax.Array:
    """QuantTensor → dense W[K, N] via jnp ops (oracle / CPU fallback)."""
    codes3 = _unpack_codes3(jnp.asarray(qt.packed))  # [K//QK, QK, N]
    nb, _, n = codes3.shape
    scales = jnp.asarray(qt.scales)[:, None, :]  # [K//QK, 1, N]
    if qt.mins is None:
        w3 = (codes3 - 8).astype(dtype) * scales.astype(dtype)
    else:
        mins = jnp.asarray(qt.mins)[:, None, :]
        w3 = codes3.astype(dtype) * scales.astype(dtype) + mins.astype(dtype)
    return w3.reshape(nb * QK, n)


def _q4_matmul_jnp(x: jax.Array, qt: QuantTensor) -> jax.Array:
    w = q4_dequantize_jnp(qt, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32,
                   precision=f32_precision(x.dtype))


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _q4_matmul_kernel(x_ref, p_ref, s_ref, o_ref, *, is_q4_1, m_ref=None):
    """One (TM, TN) output tile; K is resident in VMEM (encoder K ≤ 4096).

    Unpack is pure VPU work (nibble masks + a sublane-band concat in the
    group-local layout — no interleave shuffles), fused in front of the MXU
    dot; the packed weights cross HBM→VMEM at 4.5 bits/weight.
    """
    half, tn = p_ref.shape
    p = p_ref[:].astype(jnp.int32).reshape(half // QK, QK, tn)
    codes3 = jnp.concatenate([p & 0xF, p >> 4], axis=1).reshape(
        half * 2 // QK, QK, tn
    )  # [K//QK, QK, TN], block-major
    x = x_ref[:]
    scales = s_ref[:][:, None, :]  # [K//QK, 1, TN]
    if is_q4_1:
        mins = m_ref[:][:, None, :]
        w3 = codes3.astype(jnp.float32) * scales + mins
    else:
        w3 = (codes3 - 8).astype(jnp.float32) * scales
    w = w3.reshape(half * 2, tn).astype(x.dtype)
    o_ref[:] = jnp.dot(x, w, preferred_element_type=jnp.float32,
                       precision=f32_precision(x.dtype))


def _q4_matmul_pallas(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    mins: Optional[jax.Array],
    *,
    tile_m: int = 256,
    tile_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    n = packed.shape[-1]
    tm = min(tile_m, _round_up(m, 8))
    tn = min(tile_n, _round_up(n, 128))

    mp, np_ = _round_up(m, tm), _round_up(n, tn)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        pad_n = np_ - n
        packed = jnp.pad(packed, ((0, 0), (0, pad_n)))
        scales = jnp.pad(scales, ((0, 0), (0, pad_n)))
        if mins is not None:
            mins = jnp.pad(mins, ((0, 0), (0, pad_n)))

    is_q4_1 = mins is not None
    kernel = functools.partial(_q4_matmul_kernel, is_q4_1=is_q4_1)
    if is_q4_1:
        def kernel(x_ref, p_ref, s_ref, m_ref, o_ref):  # noqa: F811
            _q4_matmul_kernel(x_ref, p_ref, s_ref, o_ref,
                              is_q4_1=True, m_ref=m_ref)

    in_specs = [
        pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // 2, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // QK, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scales]
    if is_q4_1:
        in_specs.append(
            pl.BlockSpec((k // QK, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(mins)

    bytes_weights = k * np_ // 2 + (k // QK) * np_ * 4 * (2 if is_q4_1 else 1)
    out = pl.pallas_call(
        kernel,
        grid=(mp // tm, np_ // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * x.dtype.itemsize + bytes_weights
            + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def q4_matmul(
    x: jax.Array,
    qt: QuantTensor,
    *,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """``x[M, K] @ dequant(qt)[K, N] → f32[M, N]``.

    ``use_pallas=None`` auto-selects by regime (measured on v5e):
      * small M (≤ 2048 rows): the fused kernel wins — the matmul is
        weight-bandwidth-bound and on-the-fly dequant keeps weight traffic
        at 4.5 bits/weight (B=1 MiniLM encode: 0.87 ms vs 1.25 ms XLA);
      * large M: XLA's dequantize-then-dot wins — it materializes W once
        and amortizes dequant over all rows, while the fused kernel
        re-dequantizes per M-tile.
    """
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and x.shape[0] <= 2048)
    if not use_pallas:
        return _q4_matmul_jnp(x, qt)
    return _q4_matmul_pallas(
        x, jnp.asarray(qt.packed), jnp.asarray(qt.scales),
        None if qt.mins is None else jnp.asarray(qt.mins),
        interpret=interpret,
    )

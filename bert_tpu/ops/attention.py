"""Fused multi-head attention for short-sequence encoders (no KV cache).

Replaces the reference's per-sentence attention subgraph
(bert.cpp:822-856: QKV reshape/permute, KQ matmul, scale, softmax, context
matmul) with a single Pallas kernel per (batch, head): scores, masked
numerically-stable softmax and the context matmul all stay in VMEM, so the
[T, T] probability matrix never touches HBM.

For the reference's model family T ≤ 512 (SURVEY.md §5.7), so the whole
score tile fits comfortably in VMEM (512×512×4 B = 1 MB) — flash-style
streaming softmax is unnecessary; full-tile softmax is both simpler and
faster here. d_head (32/64) under-fills MXU lanes for the score matmuls; the
FLOP share is small at these shapes (FFN dominates), see docs/PERF.md.

Masking: the reference never needed a mask (exact-length single sentences,
bert.cpp:845); the TPU engine is batched + padded, so an additive key-side
mask bias is applied before softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import (  # noqa: F401  (NEG_INF re-exported; model.py imports)
    NEG_INF,
    f32_precision,
)


def _bias4(mask_bias):
    """[B, T] key-side bias → [B, 1, 1, T]; [B, T, T] pairwise (packed
    block-diagonal) bias → [B, 1, T, T]."""
    if mask_bias.ndim == 2:
        return mask_bias[:, None, None, :]
    if mask_bias.ndim == 3:
        return mask_bias[:, None, :, :]
    raise ValueError(f"mask_bias rank {mask_bias.ndim} not in (2, 3)")


def _mha_jnp(q, k, v, mask_bias, scale):
    """Reference path: [B, H, T, dh] batched einsum attention."""
    prec = f32_precision(q.dtype)
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32, precision=prec)
    s = s * scale + _bias4(mask_bias)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", p, v,
                      preferred_element_type=jnp.float32, precision=prec
                      ).astype(q.dtype)


def _mha_kernel(q_ref, kt_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0, 0]          # [T, dh]
    kt = kt_ref[0, 0]        # [dh, T]
    v = v_ref[0, 0]          # [T, dh]
    bias = bias_ref[0]       # [1, T]
    prec = f32_precision(q.dtype)
    s = jnp.dot(q, kt, preferred_element_type=jnp.float32,
                precision=prec) * scale + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32,
                precision=prec)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _mha_pallas(q, k, v, mask_bias, scale, interpret=False):
    b, h, t, dh = q.shape
    kt = jnp.swapaxes(k, -1, -2)  # [B, H, dh, T]
    bias3 = mask_bias[:, None, :]  # [B, 1, T] — (1,1,T) blocks tile legally

    grid = (b, h)
    out = pl.pallas_call(
        lambda q_ref, kt_ref, v_ref, bias_ref, o_ref: _mha_kernel(
            q_ref, kt_ref, v_ref, bias_ref, o_ref, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, t, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh, t), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t, dh), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t, dh), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, t, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * dh,
            bytes_accessed=(3 * b * h * t * dh + b * h * t * dh) *
            q.dtype.itemsize + b * t * 4,
            transcendentals=b * h * t * t,
        ),
        interpret=interpret,
    )(q, kt, v, bias3)
    return out


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask_bias: jax.Array,
    *,
    scale: float,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Masked MHA over [B, H, T, d_head] tensors; ``mask_bias`` is additive —
    [B, T] key-side (0 for real tokens, NEG_INF for padding) or [B, T, T]
    pairwise (packed block-diagonal rows, model.segment_attention_bias)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if mask_bias.ndim == 3:
        # packed rows run at short T where XLA batched attention wins
        # anyway (see encoder_layer policy); no Pallas pairwise-bias path
        use_pallas = False
    if not use_pallas:
        return _mha_jnp(q, k, v, mask_bias, scale)
    return _mha_pallas(q, k, v, mask_bias, scale, interpret=interpret)

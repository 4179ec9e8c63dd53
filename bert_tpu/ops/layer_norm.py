"""Fused (residual-add +) LayerNorm Pallas kernel.

Why: the encoder has 2L+1 LayerNorms, and XLA's lowering of the naive
mean/var formulation materializes several f32 passes over the [B·T, D]
activation stream in HBM — measured 0.13 ms per LN at (512, 16) on v5e,
~1.7 ms of a 5.2 ms step (docs/PERF.md), 8× above the bandwidth bound.
This kernel reads the activations (and the residual branch, fused) once as
bf16 tiles into VMEM, computes the row statistics in f32 registers, and
writes the normalized bf16 tile once: two HBM passes total instead of ~10.

Semantics match model.layer_norm exactly: f32 statistics, biased variance,
``(x - mean) * rsqrt(var + eps) * scale + bias``, result cast to the input
dtype (bert.cpp:806-814 semantics). The jnp path stays as the CPU/test
oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import round_up as _round_up


def layer_norm_jnp(x, scale, bias, eps, residual=None, pre_bias=None):
    if pre_bias is not None:
        x = x + pre_bias.astype(x.dtype)
    if residual is not None:
        x = x + residual
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * s_ref[:] + b_ref[:]).astype(o_ref.dtype)


def _ln_res_kernel(x_ref, r_ref, s_ref, b_ref, o_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * s_ref[:] + b_ref[:]).astype(o_ref.dtype)


def _ln_res_pb_kernel(x_ref, r_ref, pb_ref, s_ref, b_ref, o_ref, *, eps):
    # LN(x + pre_bias + residual): folds the projection's output-bias add
    # into the same HBM pass (the standard encoder-layer epilogue)
    xf = (x_ref[:].astype(jnp.float32) + pb_ref[:]
          + r_ref[:].astype(jnp.float32))
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * s_ref[:] + b_ref[:]).astype(o_ref.dtype)


def _pick_tile_m(d: int, itemsize: int, n_in: int, tile_m: int) -> int:
    """Largest row tile whose VMEM working set fits the ~16 MB scoped
    limit with headroom: per row the kernel holds the operand blocks
    (n_in inputs + 1 output) at the storage dtype plus two f32
    temporaries (the widened sum and the normalized rows). A fixed
    tm=1024 put the f32 D=1024 residual form at ~20 MB and Mosaic
    refused it (measured: the packed bge-large f32 LN wanted 17.75 MB);
    bf16 at the same shape sat at ~14 MB — legal but pressed against
    the limit. Budget 12 MB so both have slack."""
    per_row = d * (itemsize * (n_in + 1) + 8)
    budget = 12 * 1024 * 1024
    tm = tile_m
    while tm > 8 and tm * per_row > budget:
        tm //= 2
    return tm


def _ln_pallas(x2, scale, bias, eps, residual2, pre_bias=None,
               *, tile_m: int = 1024, interpret: bool = False):
    m, d = x2.shape
    itemsize = jnp.dtype(x2.dtype).itemsize
    n_in = 1 if residual2 is None else 2
    tile_m = _pick_tile_m(d, itemsize, n_in, tile_m)
    tm = min(tile_m, _round_up(m, 8))
    mp = _round_up(m, tm)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
        if residual2 is not None:
            residual2 = jnp.pad(residual2, ((0, mp - m), (0, 0)))

    scale2 = jnp.broadcast_to(scale.astype(jnp.float32), (1, d))
    bias2 = jnp.broadcast_to(bias.astype(jnp.float32), (1, d))

    row_spec = pl.BlockSpec((tm, d), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    sb_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    if residual2 is None:
        if pre_bias is not None:  # not an assert: -O must not drop biases
            raise ValueError("pre_bias requires the residual form")
        kernel = functools.partial(_ln_kernel, eps=eps)
        in_specs = [row_spec, sb_spec, sb_spec]
        operands = (x2, scale2, bias2)
    elif pre_bias is None:
        kernel = functools.partial(_ln_res_kernel, eps=eps)
        in_specs = [row_spec, row_spec, sb_spec, sb_spec]
        operands = (x2, residual2, scale2, bias2)
    else:
        pb2 = jnp.broadcast_to(pre_bias.astype(jnp.float32), (1, d))
        kernel = functools.partial(_ln_res_pb_kernel, eps=eps)
        in_specs = [row_spec, row_spec, sb_spec, sb_spec, sb_spec]
        operands = (x2, residual2, pb2, scale2, bias2)

    out = pl.pallas_call(
        kernel,
        grid=(mp // tm,),
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((mp, d), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=mp * d * (8 + 2 * n_in),
            bytes_accessed=(n_in + 1) * mp * d * itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:m]


def fused_layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float,
    residual: Optional[jax.Array] = None,
    pre_bias: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis of ``x`` [..., D], optionally fusing a
    residual add and a projection output-bias add
    (``LN(x + pre_bias + residual)``) into the same HBM pass."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return layer_norm_jnp(x, scale, bias, eps, residual, pre_bias)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    r2 = None if residual is None else residual.reshape(-1, shape[-1])
    return _ln_pallas(x2, scale, bias, eps, r2, pre_bias,
                      interpret=interpret).reshape(shape)

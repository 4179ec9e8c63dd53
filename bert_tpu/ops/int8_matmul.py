"""W8A8 matmul path: per-column INT8 weights × per-row INT8 activations on
the MXU's double-rate int8 pipeline.

Motivation (measured on v5e, docs/PERF.md): an XLA ``lax.dot`` on int8
operands with int32 accumulation runs at ~344 TOPS vs ~211 TFLOP/s for bf16
— the int8 MXU path is ~1.7× faster where the matmul is compute-bound
(large token counts). Mosaic/Pallas int8 matmuls do NOT currently reach
this rate, so this path is deliberately XLA-level jnp: the quantize /
dequantize epilogues fuse into neighboring ops.

Scheme:
  * weights: symmetric per-OUTPUT-column int8, ``W ≈ w_i8 * sw[None, :]``.
    Derived once at load time — from dense f32/bf16 weights or by
    dequantizing the stored Q4 blocks (the added error is ~10× smaller than
    the Q4 error already present, validated in tests/test_int8.py);
  * activations: symmetric per-ROW (per-token) int8 computed on the fly:
    ``x ≈ x_i8 * sx[:, None]``;
  * ``y = (x_i8 @ w_i8)_int32 * (sx ⊗ sw)`` — one int8 MXU dot plus a
    rank-1 f32 scale, which XLA fuses into the dot's epilogue.

This complements (does not replace) the Q4 paths: at small token counts
the Pallas fused dequant+matmul stays optimal (weight-bandwidth-bound,
4.5 bits/weight of HBM traffic); W8A8 targets the compute-bound regime.
Regime selection lives in the engine (bert_tpu/engine.py int8_threshold).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class Int8Tensor:
    """Per-column symmetric int8 weight for a logical ``W[K, N]`` matmul.

    ``w_i8[K, N]`` int8 codes, ``scale[N]`` f32: ``W ≈ w_i8 * scale``.
    Registered as a JAX pytree in bert_tpu/params.py.
    """

    w_i8: np.ndarray
    scale: np.ndarray

    @property
    def shape(self) -> Tuple[int, int]:
        return tuple(self.w_i8.shape[-2:])

    @property
    def n(self) -> int:
        return self.w_i8.shape[-1]


def _qt_flatten(it: Int8Tensor):
    return (it.w_i8, it.scale), None


def _qt_unflatten(_, leaves):
    return Int8Tensor(w_i8=leaves[0], scale=leaves[1])


jax.tree_util.register_pytree_node(Int8Tensor, _qt_flatten, _qt_unflatten)


def quantize_w8(w_kn: np.ndarray) -> Int8Tensor:
    """Dense W[..., K, N] → per-column symmetric int8 (columns = last axis)."""
    w = np.asarray(w_kn, dtype=np.float32)
    amax = np.abs(w).max(axis=-2, keepdims=True)  # [..., 1, N]
    scale = amax / 127.0
    inv = np.where(scale > 0, 1.0 / np.where(scale > 0, scale, 1.0), 0.0)
    codes = np.clip(np.rint(w * inv), -127, 127).astype(np.int8)
    return Int8Tensor(w_i8=codes, scale=scale.squeeze(-2).astype(np.float32))


def dequantize_w8(it: Int8Tensor) -> np.ndarray:
    return np.asarray(it.w_i8, np.float32) * np.asarray(it.scale,
                                                        np.float32)[..., None, :]


def quantize_activations_i8(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x[M, K] (any float dtype) → (x_i8[M, K], sx[M] f32), per-row
    symmetric. The amax reduce + scale fuse into the producing op."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # [M]
    sx = amax / 127.0
    inv = jnp.where(sx > 0, 1.0 / jnp.where(sx > 0, sx, 1.0), 0.0)
    x_i8 = jnp.clip(jnp.round(xf * inv[:, None]), -127, 127).astype(jnp.int8)
    return x_i8, sx


def int8_matmul(x: jax.Array, it: Int8Tensor) -> jax.Array:
    """``x[M, K] @ (w_i8 * scale)[K, N] → f32[M, N]`` via the int8 MXU."""
    x_i8, sx = quantize_activations_i8(x)
    acc = jax.lax.dot(x_i8, jnp.asarray(it.w_i8),
                      preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32)
            * sx[:, None]
            * jnp.asarray(it.scale, jnp.float32)[None, :])

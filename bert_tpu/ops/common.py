"""Shared kernel-side constants/helpers (single source of truth)."""

# Additive mask value standing in for -inf. Finite on purpose: fully-masked
# (padding) rows then softmax to a uniform distribution instead of NaN, and
# their outputs are discarded by pooling. Changing this (e.g. for f16
# safety) must change it for every kernel at once — hence one definition.
NEG_INF = -1e9


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def f32_precision(dtype):
    """Matmul precision for the given operand dtype: TPU MXU dots default
    to bf16-truncated multiply passes even on f32 operands, so an f32
    compute path silently computed at ~8 mantissa bits (caught by the
    compiled-kernel parity gate, tests/test_kernels_tpu.py). f32 operands
    therefore request HIGHEST (full-precision multi-pass); bf16 operands
    keep the fast default."""
    import jax
    import jax.numpy as jnp

    return (jax.lax.Precision.HIGHEST if jnp.dtype(dtype) == jnp.float32
            else None)

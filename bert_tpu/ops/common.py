"""Shared kernel-side constants/helpers (single source of truth)."""

# Additive mask value standing in for -inf. Finite on purpose: fully-masked
# (padding) rows then softmax to a uniform distribution instead of NaN, and
# their outputs are discarded by pooling. Changing this (e.g. for f16
# safety) must change it for every kernel at once — hence one definition.
NEG_INF = -1e9


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m

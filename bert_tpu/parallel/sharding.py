"""PartitionSpecs for the stacked BERT parameter pytree.

Megatron-style tensor parallelism laid out for ICI collectives
(SURVEY.md §2.6 "TPU-native equivalent"):

  * column-parallel (shard the OUT dim over ``model``): QKV projections and
    the FFN up-projection — the out dim is head-major, so contiguous shards
    hold whole heads;
  * row-parallel (shard the IN dim): attention output and FFN down
    projections — each device holds a partial sum, finished with one
    ``psum`` per residual branch (two all-reduces per layer, riding ICI);
  * replicated: embeddings, LayerNorms, row-parallel biases.

The same spec tree drives both execution styles: GSPMD ``jit`` with
NamedSharding (training — XLA inserts collectives and their gradients) and
explicit ``shard_map`` + ``psum`` (inference — Pallas kernels need manual
SPMD).

QuantTensor leaves: ``packed[L, K//2, N]`` / ``scales[L, K//32, N]`` share
one spec as a pytree prefix — both dims divide evenly as long as
``K / tp`` is a multiple of 64 (the same granularity bert.cpp:638 asserts).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# stacked layer weights: [L, K, N]. qkv_w's out dim is head-interleaved
# (params.py), so a contiguous column shard holds whole heads.
_COL_PARALLEL = {"qkv_w", "ff_i_w"}  # shard N (out)
_ROW_PARALLEL = {"o_w", "ff_o_w"}  # shard K (in)
_COL_BIAS = {"qkv_b", "ff_i_b"}  # [L, N] shard N


def param_pspecs(tp_axis: Optional[str] = MODEL_AXIS) -> Dict[str, Any]:
    """Spec tree matching the params pytree structure (prefix-style: one
    spec covers all leaves of a QuantTensor node)."""
    t = tp_axis
    layers = {}
    for key in _COL_PARALLEL:
        layers[key] = P(None, None, t)
    for key in _ROW_PARALLEL:
        layers[key] = P(None, t, None)
    for key in _COL_BIAS:
        layers[key] = P(None, t)
    for key in ("o_b", "ff_o_b", "ln_att_scale", "ln_att_bias",
                "ln_out_scale", "ln_out_bias"):
        layers[key] = P(None, None)
    emb = {k: P() for k in ("word", "token_type", "position",
                            "ln_scale", "ln_bias")}
    return {"embeddings": emb, "layers": layers}


def batch_pspec(dp_axis: Optional[str] = DATA_AXIS) -> P:
    """[B, T] activations: batch over the data axis."""
    return P(dp_axis, None)


def check_tp_divisibility(config, tp: int, quantized: bool) -> None:
    """Validate that mesh TP size divides the model cleanly."""
    if config.n_head % tp:
        raise ValueError(f"n_head {config.n_head} % tp {tp} != 0")
    if config.n_intermediate % tp:
        raise ValueError(
            f"n_intermediate {config.n_intermediate} % tp {tp} != 0")
    if quantized and (config.n_embd // tp) % 64:
        raise ValueError(
            f"quantized TP needs n_embd/tp ({config.n_embd}/{tp}) to be a "
            "multiple of 64 (Q4 block granularity, cf. bert.cpp:638)"
        )
    if quantized and (config.n_intermediate // tp) % 64:
        # ff_o_w is row-parallel with contraction dim n_intermediate: its
        # packed Q4 shard must also cut on 64-row group boundaries
        raise ValueError(
            f"quantized TP needs n_intermediate/tp "
            f"({config.n_intermediate}/{tp}) to be a multiple of 64 "
            "(Q4 block granularity of the row-parallel FFN-down shard)"
        )

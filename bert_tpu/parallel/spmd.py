"""SPMD execution: sharded inference (shard_map + explicit ICI collectives)
and GSPMD parameter placement.

Inference path: ``shard_map`` over the (data, model) mesh with the two
Megatron psums per layer written out explicitly (model.py does them when
``tp_axis`` is set). Explicit SPMD is what lets the Pallas kernels run on
per-device shards. Collectives ride ICI; XLA's latency-hiding scheduler
overlaps them with the next layer's compute.

The reference point of comparison: bert.cpp has NO distributed execution at
all (SURVEY.md §2.6) — this module is the "introduce parallelism as
first-class" requirement, not a translation.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map_mod

    shard_map = _shard_map_mod  # type: ignore[assignment]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

if not callable(shard_map):  # jax.shard_map may be a module in some versions
    shard_map = shard_map.shard_map  # type: ignore[union-attr]

from ..model import bert_forward
from .mesh import DATA_AXIS, MODEL_AXIS
from .sharding import batch_pspec, param_pspecs


def shard_params(mesh, params, pspecs: Optional[Dict[str, Any]] = None):
    """device_put the param pytree with NamedShardings from the spec tree."""
    if pspecs is None:
        pspecs = param_pspecs()
    # expand the prefix spec tree to full leaf structure
    flat_specs = _expand_prefix_specs(params, pspecs)
    return jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params, flat_specs,
    )


def _expand_prefix_specs(params, pspecs):
    """Expand a prefix spec tree (one spec per named weight) to the exact
    leaf structure of params.

    QuantTensor leaves (packed/scales/mins, all ``[L, K-derived, N]``) share
    the named weight's rank-3 spec directly. Int8Tensor leaves differ in
    rank: ``w_i8[L, K, N]`` takes the weight spec, but ``scale[L, N]`` is
    per-OUT-column — it shards with N under column parallelism and is
    replicated under row parallelism (where the spec's sharded dim is K).
    """
    from ..ops.int8_matmul import Int8Tensor

    out = {}
    for group, sub in params.items():
        out[group] = {}
        for key, val in sub.items():
            spec = pspecs[group][key]
            if isinstance(val, Int8Tensor):
                n_axis = spec[2] if len(spec) >= 3 else None
                out[group][key] = Int8Tensor(w_i8=spec,
                                             scale=P(None, n_axis))
            else:
                out[group][key] = jax.tree_util.tree_map(lambda _: spec, val)
    return out


def _local_batch_check(mesh, dp_axis: str, batch: int) -> None:
    dp = mesh.shape.get(dp_axis, 1)
    if batch % dp:
        raise ValueError(
            f"batch {batch} not divisible by data-parallel degree {dp}"
        )


def _with_batch_check(mesh, dp_axis: str, jitted):
    """Wrap a jitted (params, *batch_arrays) callable with a friendly
    batch-divisibility error instead of shard_map's raw failure."""
    def wrapped(params, *batch_args):
        if batch_args:
            _local_batch_check(mesh, dp_axis, batch_args[0].shape[0])
        return jitted(params, *batch_args)

    return wrapped


def sharded_jit(mesh, local_fn, *, n_batch_args: int, out_spec,
                params_example, dp_axis: str = DATA_AXIS,
                tp_axis: Optional[str] = MODEL_AXIS):
    """jit(shard_map(local_fn)) over the (data, model) mesh.

    ``local_fn(params, *batch_arrays)``: params are sharded per
    :func:`param_pspecs` (expanded against ``params_example``'s structure so
    quantized / int8 leaf trees work), every batch array is row-sharded over
    ``dp_axis`` on its leading axis, and the output follows ``out_spec``.
    Used by the engine to run its encode closures (wire-dtype epilogue
    included) as explicit SPMD so the Pallas kernels see per-device shards.
    """
    tp = mesh.shape.get(tp_axis, 1) if tp_axis else 1
    pspecs = param_pspecs(tp_axis if tp > 1 else None)
    flat_specs = _expand_prefix_specs(params_example, pspecs)
    kwargs = dict(
        mesh=mesh,
        in_specs=(flat_specs,) + (batch_pspec(dp_axis),) * n_batch_args,
        out_specs=out_spec,
    )
    try:
        fwd = shard_map(local_fn, check_vma=False, **kwargs)
    except TypeError:  # older jax: the kwarg is check_rep
        fwd = shard_map(local_fn, check_rep=False, **kwargs)
    # friendly error instead of shard_map's raw divisibility failure (the
    # engine's planner emits dp-multiples by construction; this guards
    # direct library users)
    return _with_batch_check(mesh, dp_axis, jax.jit(fwd))


def make_sharded_encode_fn(
    mesh,
    config,
    *,
    compute_dtype=None,
    use_pallas: Optional[bool] = None,
    dp_axis: str = DATA_AXIS,
    tp_axis: Optional[str] = MODEL_AXIS,
    pooling: str = "mean",
    params_example=None,
):
    """jitted shard_map forward: (params, ids, mask) → [B, n_embd] f32.

    Batch is sharded over ``dp_axis``; weights per param_pspecs; the two
    row-parallel projections per layer end in ``psum`` over ``tp_axis``
    (model.py encoder_layer). ``pooling`` as in bert_forward — pass the
    model's property (BertTPU.pooling) so multi-chip encode matches the
    engine.

    Pass ``params_example`` (the concrete weight tree) for quantized or
    int8 trees: their leaves differ in rank from the named weight (an
    Int8Tensor's ``scale[L, N]`` next to ``w_i8[L, K, N]``), so the prefix
    spec tree must be expanded against the real structure
    (review r4 — without it int8 params crash shard_map spec matching).
    """
    import jax.numpy as jnp

    if compute_dtype is None:
        compute_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                         else jnp.float32)
    tp = mesh.shape.get(tp_axis, 1) if tp_axis else 1
    eff_tp_axis = tp_axis if (tp_axis and tp > 1) else None

    def local_fwd(params, ids, mask):
        return bert_forward(
            params, ids, mask, config,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
            tp_axis=eff_tp_axis, pooling=pooling,
        )

    if params_example is not None:
        return sharded_jit(mesh, local_fwd, n_batch_args=2,
                           out_spec=P(dp_axis, None),
                           params_example=params_example,
                           dp_axis=dp_axis, tp_axis=tp_axis)

    pspecs = param_pspecs(tp_axis if tp > 1 else None)
    kwargs = dict(
        mesh=mesh,
        in_specs=(pspecs, batch_pspec(dp_axis), batch_pspec(dp_axis)),
        out_specs=P(dp_axis, None),
    )
    try:
        fwd = shard_map(local_fwd, check_vma=False, **kwargs)
    except TypeError:  # older jax: the kwarg is check_rep
        fwd = shard_map(local_fwd, check_rep=False, **kwargs)
    return _with_batch_check(mesh, dp_axis, jax.jit(fwd))

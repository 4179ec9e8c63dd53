"""Contrastive fine-tuning for the embedding model — a capability the
reference does not have (inference-only, SURVEY.md §5.4); added because a
production embedding stack needs domain adaptation, and it gives the
multi-chip path a real DP+TP training step to validate.

Loss: symmetric in-batch-negatives InfoNCE over L2-normalized sentence
pairs (the standard sentence-embedding objective). Optimizer: optax AdamW.

Distribution style: GSPMD — params carry NamedShardings from
bert_tpu.parallel.sharding, the batch is sharded over ``data``, and XLA
inserts every collective (and its gradient) automatically. This is the
idiomatic JAX training recipe: annotate, jit, let the compiler schedule
ICI all-reduces. (The manual shard_map/psum style lives on the inference
path, where Pallas kernels require explicit SPMD.)

Only dense (f32/bf16) parameters are trainable; Q4 weights are a
serving-time artifact produced by post-training quantization (train →
quantize → serve), matching the reference's pipeline (convert → quantize).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .model import bert_forward
from .params import BertConfig


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _decay_mask(params) -> Dict[str, Dict[str, bool]]:
    """Standard BERT fine-tuning decay mask: weight matrices and embedding
    tables decay; LayerNorm scales/biases and projection biases do not
    (review r4 — decaying LN scales toward zero degrades long runs). Keyed
    by NAME, not ndim: stacked layer leaves are all rank ≥ 2 here (biases
    are [L, D]), so the usual ndim<2 heuristic would decay everything."""
    emb_decay = ("word", "token_type", "position")
    return {
        "embeddings": {k: k in emb_decay for k in params["embeddings"]},
        "layers": {k: k.endswith("_w") for k in params["layers"]},
    }


def make_optimizer(learning_rate: float = 2e-5,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay,
                       mask=_decay_mask)


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def info_nce_loss(emb_a: jax.Array, emb_b: jax.Array,
                  temperature: float = 0.05) -> jax.Array:
    """Symmetric InfoNCE with in-batch negatives over L2-normed embeddings."""
    logits = emb_a @ emb_b.T / temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    l_ab = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    l_ba = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (l_ab.mean() + l_ba.mean())


def make_train_step(
    config: BertConfig,
    optimizer: optax.GradientTransformation,
    *,
    temperature: float = 0.05,
    compute_dtype=jnp.float32,
    use_pallas: Optional[bool] = False,
    remat: bool = True,
    jit: bool = True,
    pooling: str = "mean",
):
    """Pure (state, batch) → (state, metrics) step, jitted by default.

    batch = {ids_a, mask_a, ids_b, mask_b}: positive sentence pairs.
    Per-layer rematerialization is on by default (jax.checkpoint on the
    scanned encoder layer): backward-pass activation residency becomes
    O(1) in depth, which is what lets large batch × long sequence training
    fit HBM — the classic FLOPs-for-memory trade.

    ``jit=False`` returns the raw python step for callers that apply their
    own jit with explicit shardings (make_sharded_train_step) — calling
    the raw step directly re-traces eagerly every time (~10x slower even
    single-device).
    """

    def loss_fn(params, batch):
        # pooling must match the checkpoint's readout (engine.pooling) —
        # contrastive-tuning a CLS model through a mean-pooled loss trains
        # the wrong vector (review r4)
        emb_a = bert_forward(params, batch["ids_a"], batch["mask_a"], config,
                             compute_dtype=compute_dtype,
                             use_pallas=use_pallas, remat=remat,
                             pooling=pooling)
        emb_b = bert_forward(params, batch["ids_b"], batch["mask_b"], config,
                             compute_dtype=compute_dtype,
                             use_pallas=use_pallas, remat=remat,
                             pooling=pooling)
        return info_nce_loss(emb_a, emb_b, temperature)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return jax.jit(train_step) if jit else train_step


def make_sharded_train_step(
    mesh,
    config: BertConfig,
    optimizer: optax.GradientTransformation,
    state: TrainState,
    *,
    temperature: float = 0.05,
    compute_dtype=jnp.float32,
    pooling: str = "mean",
):
    """GSPMD-jitted train step over the mesh + state placed on it.

    Parameter/opt-state shardings come from param_pspecs (TP over 'model');
    the batch is sharded over 'data'. Returns (placed_state, jitted_step).
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from .parallel.mesh import DATA_AXIS, MODEL_AXIS
    from .parallel.sharding import batch_pspec, param_pspecs
    from .parallel.spmd import _expand_prefix_specs

    if DATA_AXIS not in mesh.shape:
        # every spec below names the standard axes — a mesh with custom
        # axis names would silently run tp=1 and then crash on the batch
        # sharding (review r4); fail with the fix spelled out
        raise ValueError(
            f"mesh axes {tuple(mesh.shape)} lack '{DATA_AXIS}' — build the "
            f"mesh with parallel.mesh.make_mesh (axes '{DATA_AXIS}'/"
            f"'{MODEL_AXIS}')")
    tp = mesh.shape.get(MODEL_AXIS, 1)
    pspecs = _expand_prefix_specs(state.params,
                                  param_pspecs(MODEL_AXIS if tp > 1
                                               else None))

    def _sh(spec):
        return NamedSharding(mesh, spec)

    param_sh = jax.tree_util.tree_map(_sh, pspecs)
    placed_params = jax.tree_util.tree_map(jax.device_put, state.params,
                                           param_sh)
    # Place the INCOMING opt state (it may hold restored AdamW moments —
    # re-initializing here would silently reset mu/nu and break checkpoint
    # resume). A fresh init on the placed params provides the reference
    # shardings: mu/nu mirror the params, scalar counts replicate.
    ref_opt = optimizer.init(placed_params)

    def _ref_sharding(ref):
        sh = ref.sharding
        if not isinstance(sh, NamedSharding):  # scalar counts → replicate
            sh = _sh(P())
        return sh

    opt_shardings = jax.tree_util.tree_map(_ref_sharding, ref_opt)
    # free the throwaway zero moments BEFORE placing the real ones: mu+nu
    # are ~2x the parameter footprint, and holding both trees doubles the
    # transient HBM peak for nothing (review r4)
    for leaf in jax.tree_util.tree_leaves(ref_opt):
        if hasattr(leaf, "delete"):
            leaf.delete()
    del ref_opt
    opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state,
                                       opt_shardings)
    placed = TrainState(params=placed_params, opt_state=opt_state,
                        step=jax.device_put(state.step, _sh(P())))

    step_fn = make_train_step(config, optimizer, temperature=temperature,
                              compute_dtype=compute_dtype, use_pallas=False,
                              jit=False, pooling=pooling)
    batch_sh = _sh(batch_pspec(DATA_AXIS))
    jitted = jax.jit(
        step_fn,
        in_shardings=(None, {"ids_a": batch_sh, "mask_a": batch_sh,
                             "ids_b": batch_sh, "mask_b": batch_sh}),
        donate_argnums=(0,),
    )
    return placed, jitted

"""Batched, masked BERT encoder forward — the TPU-native replacement for the
reference's per-sentence ggml graph (bert.cpp:720-941, SURVEY.md §3.3).

Design (idiomatic JAX, not a ggml translation):
  * one pure function traced once under ``jax.jit`` per (B, T) bucket —
    XLA buffer assignment replaces the reference's arena/scratch planner
    (bert.cpp:678-713 disappears entirely);
  * all L layers are stacked and driven by ``lax.scan`` (single-trace,
    compile-time O(1) in depth, stacked leaves shard cleanly);
  * attention-masked and batch-padded from day one (the reference loops
    sentences serially with exact shapes, bert.cpp:749-750);
  * mean pooling + L2 normalization live in-graph, as in the reference
    (bert.cpp:906-913, SentenceTransformers semantics hardcoded);
  * weights may be dense (f32/bf16) or weight-only INT4
    :class:`~bert_tpu.quant.QuantTensor` leaves, dispatched to the fused
    Pallas dequant+matmul;
  * for tensor parallelism the function takes an optional mesh axis name:
    inside ``shard_map`` the row-parallel projections (attention output,
    FFN down) finish with a ``psum`` over that axis — the GSPMD/scaling-book
    recipe, not a NCCL translation.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .ops.attention import NEG_INF, multi_head_attention
from .ops.common import f32_precision
from .ops.fused_attention import fused_qkv_attention, pick_head_chunk
from .ops.int8_matmul import Int8Tensor, int8_matmul
from .ops.layer_norm import fused_layer_norm
from .ops.q4_matmul import q4_matmul
from .params import BertConfig
from .quant import QuantTensor

# Attention routing: the fused QKV-attention kernel wherever
# ops/fused_attention.pick_head_chunk finds a whole-kernel or head-chunked
# configuration inside the measured Mosaic compile envelope — on
# MiniLM-class models that is the whole kernel at every bucket; long-T ×
# large-D shapes grid over head chunks. Measured on v5e the fused kernel
# beats the per-(batch, head) kernel at every encoder length ((64,256):
# 6.3 vs 14.0 ms; (16,512): 3.0 vs 4.9 ms — docs/PERF.md); the per-(b,h)
# kernel remains the fallback when no chunking fits (odd head dims, f32
# long-T).


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float, *, residual: Optional[jax.Array] = None,
               pre_bias: Optional[jax.Array] = None,
               use_pallas: Optional[bool] = None) -> jax.Array:
    """LayerNorm over the last axis, f32 statistics (bert.cpp:806-814).
    On TPU this runs as the fused Pallas kernel (ops/layer_norm.py) — one
    read + one write instead of XLA's multiple f32 HBM passes; the residual
    add and the projection's output-bias add fuse into the same pass."""
    return fused_layer_norm(x, scale, bias, eps=eps, residual=residual,
                            pre_bias=pre_bias, use_pallas=use_pallas)


def dense(x: jax.Array, w, b: Optional[jax.Array] = None, *,
          use_pallas: Optional[bool] = None) -> jax.Array:
    """``x @ W (+ b)`` where W is dense, a QuantTensor (INT4, Pallas/XLA
    dequant paths) or an Int8Tensor (W8A8 int8-MXU path)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    if isinstance(w, QuantTensor):
        y = q4_matmul(x2, w, use_pallas=use_pallas).astype(x.dtype)
        n = w.n
    elif isinstance(w, Int8Tensor):
        y = int8_matmul(x2, w).astype(x.dtype)
        n = w.n
    else:
        y = jnp.dot(x2, w.astype(x.dtype), preferred_element_type=jnp.float32,
                    precision=f32_precision(x.dtype)).astype(x.dtype)
        n = w.shape[-1]
    y = y.reshape(*shape[:-1], n)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def embed(params_emb: Dict[str, Any], token_ids: jax.Array,
          config: BertConfig, dtype,
          position_ids: Optional[jax.Array] = None,
          use_pallas: Optional[bool] = None) -> jax.Array:
    """Token + token-type(0) + position embeddings, then LayerNorm
    (bert.cpp:784-814). token_type_ids are always 0, as in the reference
    (bert.cpp:787-788). ``position_ids`` overrides the default 0..T-1
    positions — packed rows restart positions at each segment."""
    t = token_ids.shape[-1]
    word = jnp.asarray(params_emb["word"])
    x = word[token_ids].astype(dtype)
    x = x + jnp.asarray(params_emb["token_type"])[0].astype(dtype)
    position = jnp.asarray(params_emb["position"])
    if position_ids is None:
        x = x + position[:t].astype(dtype)
    else:
        x = x + position[position_ids].astype(dtype)
    return layer_norm(x, params_emb["ln_scale"], params_emb["ln_bias"],
                      config.layer_norm_eps, use_pallas=use_pallas)


def encoder_layer(
    x: jax.Array,
    lp: Dict[str, Any],
    mask_bias: jax.Array,
    config: BertConfig,
    *,
    use_pallas: Optional[bool] = None,
    tp_axis: Optional[str] = None,
) -> jax.Array:
    """One transformer encoder block (bert.cpp:816-903).

    Under tensor parallelism (``tp_axis`` set, inside shard_map), the QKV and
    FFN-up weights are column-sharded and the output/FFN-down weights are
    row-sharded, so each of the two residual branches ends with one psum.
    """
    b, t, _ = x.shape
    dh = config.d_head
    # ONE fused head-interleaved QKV matmul (see params.py): the out dim is
    # [H, 3, d_head]-ordered, so under TP a column shard holds whole heads
    # and the local head count falls out of the shard width.
    qkv = dense(x, lp["qkv_w"], lp["qkv_b"], use_pallas=use_pallas)
    hl = qkv.shape[-1] // (3 * dh)  # local heads (h/tp under TP)

    scale = 1.0 / (config.d_head ** 0.5)  # bert.cpp:848
    # Attention policy (measured on v5e, docs/PERF.md): at short T the cost
    # is HBM relayout (head split/merge + score tensors), so the fused
    # QKV-attention kernel that never leaves the [B, T, lanes] layout wins;
    # at long T the per-(batch, head) flash-style kernel keeps the [T, T]
    # tile in VMEM. The jnp einsum path is the CPU/oracle fallback.
    head_chunk = pick_head_chunk(t, hl, dh, qkv.dtype,
                                 pairwise=mask_bias.ndim == 3)
    fused_short = (head_chunk is not None and use_pallas is not False
                   and jax.default_backend() == "tpu")
    if fused_short:
        ctx = fused_qkv_attention(qkv, mask_bias, n_head=hl, d_head=dh,
                                  scale=scale, head_chunk=head_chunk)
    else:
        qkv = qkv.reshape(b, t, hl, 3, dh).transpose(0, 2, 3, 1, 4)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,hl,T,dh]
        attn_pallas = use_pallas if t >= 256 else False
        ctx = multi_head_attention(q, k, v, mask_bias, scale=scale,
                                   use_pallas=attn_pallas)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, -1)

    att_out = dense(ctx, lp["o_w"], None, use_pallas=use_pallas)
    if tp_axis is not None:
        att_out = jax.lax.psum(att_out, tp_axis)
    x = layer_norm(att_out, lp["ln_att_scale"], lp["ln_att_bias"],
                   config.layer_norm_eps, residual=x, pre_bias=lp["o_b"],
                   use_pallas=use_pallas)  # residual 1, bert.cpp:859-875

    hgate = dense(x, lp["ff_i_w"], lp["ff_i_b"], use_pallas=use_pallas)
    hgate = jax.nn.gelu(hgate, approximate=config.gelu_approx)  # bert.cpp:882
    ff_out = dense(hgate, lp["ff_o_w"], None, use_pallas=use_pallas)
    if tp_axis is not None:
        ff_out = jax.lax.psum(ff_out, tp_axis)
    return layer_norm(ff_out, lp["ln_out_scale"], lp["ln_out_bias"],
                      config.layer_norm_eps, residual=x,
                      pre_bias=lp["ff_o_b"],
                      use_pallas=use_pallas)  # residual 2, bert.cpp:885-901


def segment_attention_bias(segment_ids: jax.Array) -> jax.Array:
    """[B, T] segment ids (0 = padding) → [B, T, T] additive attention bias:
    0 where query and key share a non-padding segment, NEG_INF elsewhere.
    Makes packed rows exactly block-diagonal — tokens never attend across
    sentence boundaries."""
    same = segment_ids[:, :, None] == segment_ids[:, None, :]
    key_valid = (segment_ids > 0)[:, None, :]
    return jnp.where(same & key_valid, 0.0, NEG_INF).astype(jnp.float32)


def segment_mean_pool_l2(x: jax.Array, segment_ids: jax.Array,
                         n_segments: int) -> jax.Array:
    """Per-segment masked mean pool + L2 normalize, in f32.

    x [B, T, D], segment_ids [B, T] (0 = padding, 1..n_segments) →
    [B, n_segments, D]; empty slots come out as zero vectors."""
    xf = x.astype(jnp.float32)
    # one_hot of -1 (padding) is all-zero, so pad tokens drop out
    oh = jax.nn.one_hot(segment_ids - 1, n_segments, dtype=jnp.float32)
    sums = jnp.einsum("bts,btd->bsd", oh, xf,
                      precision=jax.lax.Precision.HIGHEST)
    counts = jnp.sum(oh, axis=1)[..., None]
    pooled = sums / jnp.maximum(counts, 1.0)
    norm = jnp.sqrt(jnp.sum(jnp.square(pooled), axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)


def mean_pool_l2(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean pool + L2 normalize, in f32 (bert.cpp:906-913)."""
    xf = x.astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]
    denom = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    pooled = jnp.sum(xf * m, axis=-2) / denom
    norm = jnp.sqrt(jnp.sum(jnp.square(pooled), axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)


def cls_pool_l2(x: jax.Array) -> jax.Array:
    """[CLS]-token pool + L2 normalize, in f32.

    The reference hardcodes mean pooling (bert.cpp:906-913) because its
    model zoo is sentence-transformers MiniLM variants; BGE-family
    checkpoints (our flagship large class) are trained with CLS pooling —
    mean-pooling them degrades retrieval quality, so pooling is a model
    property, not a constant. Every row starts with [CLS] (tokenizer
    always emits it, even for the empty string), so position 0 is valid
    under any mask."""
    xf = x[..., 0, :].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    return xf / jnp.maximum(norm, 1e-12)


def segment_cls_pool_l2(x: jax.Array, segment_ids: jax.Array,
                        n_segments: int) -> jax.Array:
    """Per-segment [CLS] pool + L2 normalize for packed rows.

    Each packed segment is a complete tokenized sentence, so its first
    token is its [CLS]; positions restart per segment (bert_tpu/packing.py).
    x [B, T, D], segment_ids [B, T] (0 = padding, 1..n_segments) →
    [B, n_segments, D]; empty slots come out as zero vectors."""
    xf = x.astype(jnp.float32)
    hit = segment_ids[:, :, None] == (1 + jnp.arange(n_segments))[None, None]
    first = jnp.argmax(hit, axis=1)  # [B, S]: first token of each segment
    cls = jnp.take_along_axis(xf, first[:, :, None], axis=1)
    present = jnp.any(hit, axis=1)[..., None]
    pooled = jnp.where(present, cls, 0.0)
    norm = jnp.sqrt(jnp.sum(jnp.square(pooled), axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)


def bert_forward(
    params: Dict[str, Any],
    token_ids: jax.Array,
    mask: jax.Array,
    config: BertConfig,
    *,
    compute_dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    tp_axis: Optional[str] = None,
    remat: bool = False,
    pooling: str = "mean",
) -> jax.Array:
    """token_ids [B, T] int32, mask [B, T] → L2-normalized embeddings
    [B, n_embd] f32. The full SURVEY.md §3.3 graph, batched.

    ``pooling`` is "mean" (sentence-transformers semantics, the reference's
    hardcoded choice) or "cls" (BGE-family checkpoints).

    ``remat=True`` checkpoints each scanned layer (training-time
    rematerialization: activations are recomputed in the backward pass
    instead of stored — O(1) residency in depth, the standard JAX trade of
    FLOPs for HBM)."""
    if pooling not in ("mean", "cls"):
        raise ValueError(f"pooling must be 'mean' or 'cls', got {pooling!r}")
    x = embed(params["embeddings"], token_ids, config, compute_dtype,
              use_pallas=use_pallas)
    # 0 for real tokens, NEG_INF for padding
    mask_bias = (mask.astype(jnp.float32) - 1.0) * (-NEG_INF)

    step = functools.partial(
        encoder_layer, mask_bias=mask_bias, config=config,
        use_pallas=use_pallas, tp_axis=tp_axis,
    )

    def body(carry, lp):
        return step(carry, lp), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["layers"])
    if pooling == "cls":
        return cls_pool_l2(x)
    return mean_pool_l2(x, mask)


def bert_forward_packed(
    params: Dict[str, Any],
    token_ids: jax.Array,
    segment_ids: jax.Array,
    position_ids: jax.Array,
    config: BertConfig,
    *,
    n_segments: int,
    compute_dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    tp_axis: Optional[str] = None,
    remat: bool = False,
    pooling: str = "mean",
) -> jax.Array:
    """Packed-row forward: token_ids/segment_ids/position_ids [B, T] →
    per-segment L2-normalized embeddings [B, n_segments, n_embd] f32.

    Same encoder stack as :func:`bert_forward`; the differences are exactly
    the three packing requirements (bert_tpu/packing.py): per-segment
    positions, block-diagonal attention, per-segment pooling. Empty segment
    slots return zero vectors. ``remat`` checkpoints each scanned layer,
    as in :func:`bert_forward`."""
    if pooling not in ("mean", "cls"):
        raise ValueError(f"pooling must be 'mean' or 'cls', got {pooling!r}")
    x = embed(params["embeddings"], token_ids, config, compute_dtype,
              position_ids=position_ids, use_pallas=use_pallas)
    mask_bias = segment_attention_bias(segment_ids)

    step = functools.partial(
        encoder_layer, mask_bias=mask_bias, config=config,
        use_pallas=use_pallas, tp_axis=tp_axis,
    )

    def body(carry, lp):
        return step(carry, lp), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["layers"])
    if pooling == "cls":
        return segment_cls_pool_l2(x, segment_ids, n_segments)
    return segment_mean_pool_l2(x, segment_ids, n_segments)

"""Fused short-sequence attention over the raw QKV projection output.

Why this kernel exists (measured on v5e, docs/PERF.md): at encoder sequence
lengths (T ≤ 128), XLA's attention path is dominated not by FLOPs but by
HBM relayout — the [B, T, 3D] QKV matmul output gets reshaped/transposed to
[B, H, T, d_head] (two full HBM round trips), the [B, H, T, T] f32 score
tensor round-trips HBM through softmax, and the context gets transposed
back. At (512, 64) that machinery is ~11 ms of a 19 ms step while the
useful attention FLOPs are microseconds.

This kernel consumes the QKV output in its native [B, T, 3D]
head-interleaved layout (bert_tpu/params.py: per head h, lanes
[3·dh·h : 3·dh·h+dh) = q, then k, then v) and emits context in the native
[B, T, D] layout — zero HBM relayout. Inside VMEM it:

 1. slices per-(group, head) q/k/v tiles and stacks them along sublanes
    into ``[G·H·T, dh]`` operand matrices (register shuffles, not HBM);
 2. computes ONE MXU-shaped score matrix ``[G·H·T, G·H·T]`` — the
    cross-(group, head) blocks are garbage and get masked block-diagonally,
    trading (G·H)× redundant MXU flops (trivial at these T) for full MXU
    utilization instead of thousands of 16×32 micro-matmuls;
 3. applies the key-side padding bias ([B, T]) or the packed pairwise
    segment bias ([B, T, T]) inside the same tile, softmaxes in f32, and
    contracts with V — the probability matrix never leaves VMEM.

The same block-diagonal-masking idea the engine uses for sequence packing,
applied one level down: batch rows and heads pack into the MXU tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import NEG_INF, f32_precision, round_up as _round_up


def _fused_attn_kernel(qkv_ref, bias_ref, o_ref, *, n_head, d_head, seq,
                       group, scale, pairwise):
    """Per-head attention over G-packed rows, entirely in VMEM.

    Head h's q/k/v are unaligned dh-wide lane slices of the [G·T, 3D]
    head-interleaved block — legal as standalone matmul operands (only
    concatenation of mismatched lane offsets is not lowerable). Packing G
    batch rows into the score matrix makes each [G·T, G·T] tile MXU-sized
    even at T=16 (G=128//T), with a single dh-deep contraction pass —
    cross-group pairs are masked block-diagonally, costing G× redundant
    score flops, which is the cheapest of the packing trades (any
    formulation pays ≥ (128/T)× at short T because the MXU tile is 128²).
    """
    h, dh, t, g = n_head, d_head, seq, group
    n = g * t
    d = h * dh
    qkv = qkv_ref[:].reshape(n, 3 * d)  # [G·T, 3D] (leading-dims merge only)

    # row/col block mask: packed batch rows must not attend across groups
    blk_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // t
    blk_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // t
    same_blk = blk_i == blk_j
    if pairwise:
        b3 = bias_ref[:]  # [G, T, T]
        rows = (jnp.concatenate([b3[gi] for gi in range(g)], axis=0)
                if g > 1 else b3[0])  # [n, T]: row i → bias[g_i, t_i, :]
        bias2d = (jnp.concatenate([rows] * g, axis=1) if g > 1 else rows)
    else:
        b2 = bias_ref[:]  # [G, 1, T]
        bias2d = (jnp.concatenate([b2[gi] for gi in range(g)], axis=1)
                  if g > 1 else b2[0])  # [1, n], broadcasts over rows

    # merge block mask + bias into ONE additive f32 tile, hoisted out of
    # the head loop (softmax VPU passes dominate this kernel — every pass
    # over the [n, n] tile counts)
    biasmask = jnp.where(same_blk, jnp.broadcast_to(bias2d, (n, n)), NEG_INF)

    prec = f32_precision(qkv.dtype)
    ctxs = []
    for hi in range(h):
        base = hi * 3 * dh
        # fold the 1/√dh score scale into q (dh lanes, not n² elements)
        q = qkv[:, base:base + dh] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, base + dh:base + 2 * dh]
        v = qkv[:, base + 2 * dh:base + 3 * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) + biasmask  # [n, n], single dh-deep MXU pass per 128×128 tile
        m = jnp.max(s, axis=-1, keepdims=True)
        e = (jnp.exp(s - m)).astype(qkv.dtype)
        # defer normalization to the dh-wide context (n·dh ≪ n² divides)
        ctx = jnp.dot(e, v, preferred_element_type=jnp.float32,
                      precision=prec)
        denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        ctxs.append(ctx / denom)
    # per-head [n, dh] outputs concatenate along lanes into the model's
    # native [.., D] layout (all pieces lane-offset 0 — legal concat)
    ctx = jnp.concatenate(ctxs, axis=1)  # [n, D]
    o_ref[:] = ctx.reshape(g, t, d).astype(o_ref.dtype)


def pick_group(n_head: int, seq: int, target: int = 128) -> int:
    """Rows of the in-kernel score matrix: G·T ≈ target (one MXU tile of
    rows). Redundant flops grow linearly with G·T (cross-group pairs are
    masked), so the smallest MXU-filling group wins."""
    del n_head
    return max(1, target // seq)


def pick_head_chunk(seq: int, n_head: int, d_head: int, dtype,
                    pairwise: bool = False) -> Optional[int]:
    """Heads per kernel invocation. ``n_head`` (whole kernel, the fast
    path) when the full shape is inside the Mosaic compile envelope;
    otherwise the largest divisor of ``n_head`` whose lane-block width
    (3·d_head·chunk) is a multiple of 128 and whose per-chunk shape fits
    the envelope — the kernel then grids over head chunks, with the
    BlockSpec slicing each chunk's lanes (so per-step VMEM and compile
    size scale with the chunk, not the model). None → no fused route
    (per-(batch, head) kernel)."""
    if fused_attn_supported(seq, n_head, d_head, dtype, pairwise=pairwise):
        return n_head
    for hc in range(n_head - 1, 0, -1):
        if n_head % hc:
            continue
        if (3 * d_head * hc) % 128:
            continue
        if fused_attn_supported(seq, hc, d_head, dtype, pairwise=pairwise):
            return hc
    return None


def fused_attn_supported(seq: int, n_head: int, d_head: int, dtype,
                         pairwise: bool = False) -> bool:
    """Is the fused kernel compilable at this config on THIS toolchain?

    The measured table below (:func:`fused_attn_table`) is trusted only on
    the toolchains it was measured on; any other jax/libtpu/Mosaic version
    probe-compiles the config in a crash-isolated subprocess and caches the
    verdict persistently (ops/mosaic_probe.py, VERDICT r2 #1) — so a
    toolchain bump can neither crash serving startup (the old failure mode:
    a remote tpu_compile_helper exit, unrecoverable in-process) nor
    silently mis-route shapes that now compile."""
    from .mosaic_probe import fused_attn_ok

    return fused_attn_ok(seq, n_head, d_head, dtype, pairwise=pairwise,
                         table_fn=fused_attn_table)


def fused_attn_table(seq: int, n_head: int, d_head: int, dtype) -> bool:
    """Measured Mosaic compile envelope for this kernel on v5e (round 2).

    Big (T, D=H·dh) combinations crash the Mosaic compiler (remote
    tpu_compile_helper exit 1 — not a clean scoped-VMEM error), and the
    failure boundary is irregular in H: e.g. at T=512, (H=8, dh=64) and
    (H=12, dh=48) compile but (H=16, dh=32) and (H=12, dh=64) do not;
    (T=384, H=16, dh=64) compiles but (T=384, H=24, dh=64) does not;
    (T=256, H=24, dh=64) compiles but (T=256, H=32, dh=64) does not.
    The rule below keeps a safety margin under every measured failure —
    unsupported shapes route to the per-(batch, head) kernel
    (ops/attention.py), whose relayout overhead matters least exactly at
    these long-T/large-D shapes where score FLOPs dominate.

    In model terms: MiniLM-class (D=384) is fused at every bucket;
    bert-base (D=768) and bge-large-class (D=1024, H=16) are fused for
    T ≤ 384 and fall back only at the 512 bucket; H ≥ 24 falls back
    above T=128.
    """
    d = n_head * d_head
    if jnp.dtype(dtype) == jnp.float32:
        # full-precision passes roughly double the working set: shift the
        # envelope one bucket down (MiniLM measured OK at T=256, and the
        # T=512 f32 fused case measured 22.2 MB of scoped VMEM). The third
        # row is the head-chunked long-T regime: chunks of ≤4 heads /
        # ≤128 lanes compile in 1-3 s and match the oracle to ~3e-7 at
        # every T ≤ 512 probed (512/H12/dh32 hc4, 512/H16/dh64 hc2, ...)
        return (seq <= 128 and d <= 512 and n_head <= 16) or \
               (seq <= 256 and d <= 384 and n_head <= 12) or \
               (seq <= 512 and d <= 128 and n_head <= 4)
    if seq <= 128:
        return d <= 1536 and n_head <= 24
    if seq <= 256:
        return d <= 1024 and n_head <= 16
    if seq <= 384:
        return d <= 1024 and n_head <= 16
    return d <= 384 and n_head <= 12


def fused_qkv_attention(
    qkv: jax.Array,
    mask_bias: jax.Array,
    *,
    n_head: int,
    d_head: int,
    scale: float,
    group: Optional[int] = None,
    head_chunk: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """qkv [B, T, 3D] (head-interleaved) + additive bias ([B, T] key-side or
    [B, T, T] pairwise) → context [B, T, D].

    ``head_chunk`` (default: all heads) grids the kernel over chunks of
    heads: the qkv/output BlockSpecs slice each chunk's 3·dh·hc lanes, so
    the kernel body, its VMEM blocks, and Mosaic's compile size all scale
    with the chunk — this is what keeps long-T × large-D shapes inside the
    compiler's envelope (see :func:`pick_head_chunk`). The head-interleaved
    layout makes the lane slicing free: chunk c owns exactly lanes
    [3·dh·hc·c, 3·dh·hc·(c+1))."""
    b, t, _ = qkv.shape
    d = n_head * d_head
    hc = head_chunk if head_chunk is not None else n_head
    assert n_head % hc == 0, (n_head, hc)
    pairwise = mask_bias.ndim == 3
    if not pairwise:
        # [B, T] → [B, 1, T]: keeps the block's last-two dims (1, T) legal
        # for Mosaic regardless of the group size in the leading dim
        mask_bias = mask_bias[:, None, :]
    g = group if group is not None else pick_group(n_head, t)
    bp = _round_up(b, g)
    if bp != b:
        qkv = jnp.pad(qkv, ((0, bp - b), (0, 0), (0, 0)))
        mask_bias = jnp.pad(mask_bias, ((0, bp - b), (0, 0), (0, 0)))

    kernel = functools.partial(
        _fused_attn_kernel, n_head=hc, d_head=d_head, seq=t, group=g,
        scale=scale, pairwise=pairwise,
    )
    bias_block = (g, t, t) if pairwise else (g, 1, t)
    bias_index = lambda i, c: (i, 0, 0)  # noqa: E731  (chunk-invariant)
    n = g * t  # rows of the in-kernel score matrix
    itemsize = jnp.dtype(qkv.dtype).itemsize
    out = pl.pallas_call(
        kernel,
        grid=(bp // g, n_head // hc),
        in_specs=[
            pl.BlockSpec((g, t, 3 * d_head * hc), lambda i, c: (i, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_block, bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t, d_head * hc), lambda i, c: (i, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, t, d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=(bp // g) * n_head * 4 * n * n * d_head,
            bytes_accessed=bp * t * 4 * d * itemsize
            + (bp // g) * n_head * n * n * 4,
            transcendentals=(bp // g) * n_head * n * n,
        ),
        interpret=interpret,
    )(qkv, mask_bias)
    return out[:b]

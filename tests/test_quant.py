"""Q4_0/Q4_1 codec tests: round-trips, error bounds, layout equivalence
(SURVEY.md §4 "quant/dequant round-trip")."""

import jax
import numpy as np
import pytest

from bert_tpu.quant import (
    QK,
    dequantize_tpu,
    nibble_histogram,
    q4_0_dequantize,
    q4_0_quantize,
    q4_1_dequantize,
    q4_1_quantize,
    q4_from_ggml_bytes,
    q4_to_ggml_bytes,
    quantize_tensor_tpu,
    repack_codes_tpu,
    unpack_tpu_layout,
    pack_tpu_layout,
)

RNG = np.random.default_rng(42)


def test_q4_0_roundtrip_error():
    x = RNG.standard_normal((8, 256)).astype(np.float32)
    codes, scales = q4_0_quantize(x)
    assert codes.shape == x.shape and codes.max() <= 15
    assert scales.shape == (8, 256 // QK)
    y = q4_0_dequantize(codes, scales)
    # max error per block is d/2 = amax/14
    blocks = x.reshape(8, -1, QK)
    amax = np.abs(blocks).max(-1, keepdims=True)
    assert np.all(np.abs((y - x).reshape(8, -1, QK)) <= amax / 14 + 1e-6)


def test_q4_1_roundtrip_error():
    x = (RNG.standard_normal((4, 128)) * 3 + 1).astype(np.float32)
    codes, scales, mins = q4_1_quantize(x)
    y = q4_1_dequantize(codes, scales, mins)
    blocks = x.reshape(4, -1, QK)
    spread = blocks.max(-1, keepdims=True) - blocks.min(-1, keepdims=True)
    assert np.all(np.abs((y - x).reshape(4, -1, QK)) <= spread / 30 + 1e-6)


def test_q4_0_zero_block():
    x = np.zeros((1, QK), np.float32)
    codes, scales = q4_0_quantize(x)
    assert scales[0, 0] == 0
    assert np.all(q4_0_dequantize(codes, scales) == 0)


def test_q4_1_constant_block():
    x = np.full((1, QK), 2.5, np.float32)
    codes, scales, mins = q4_1_quantize(x)
    y = q4_1_dequantize(codes, scales, mins)
    np.testing.assert_allclose(y, x, atol=1e-6)


@pytest.mark.parametrize("variant", ["q4_0", "q4_1"])
def test_ggml_stream_roundtrip(variant):
    x = RNG.standard_normal((6, 192)).astype(np.float32)
    if variant == "q4_0":
        codes, scales = q4_0_quantize(x)
        mins = None
        ftype = 2
    else:
        codes, scales, mins = q4_1_quantize(x)
        ftype = 3
    raw = q4_to_ggml_bytes(codes, scales, mins)
    exp_bytes = x.size // QK * (20 if variant == "q4_0" else 24)
    assert len(raw) == exp_bytes
    c2, s2, m2 = q4_from_ggml_bytes(raw, x.shape, ftype)
    np.testing.assert_array_equal(codes, c2)
    np.testing.assert_array_equal(scales, s2)
    if mins is not None:
        np.testing.assert_array_equal(mins, m2)


def test_tpu_pack_unpack_inverse():
    codes = RNG.integers(0, 16, size=(128, 64), dtype=np.uint8)
    np.testing.assert_array_equal(unpack_tpu_layout(pack_tpu_layout(codes)),
                                  codes)


@pytest.mark.parametrize("ftype", [2, 3])
def test_tpu_layout_matches_rowwise_quant(ftype):
    """quantize_tensor_tpu(W) dequantizes to the same values as the row-wise
    ggml codec applied to Wᵀ (same blocks, same scales)."""
    w = RNG.standard_normal((192, 96)).astype(np.float32)  # [K, N], K % 64 == 0
    qt = quantize_tensor_tpu(w, ftype)
    y = dequantize_tpu(qt)
    if ftype == 2:
        codes, scales = q4_0_quantize(w.T)
        ref = q4_0_dequantize(codes, scales).T
    else:
        codes, scales, mins = q4_1_quantize(w.T)
        ref = q4_1_dequantize(codes, scales, mins).T
    np.testing.assert_allclose(y, ref, rtol=0, atol=0)


def test_repack_is_bit_exact():
    """ggml-layout codes repacked to TPU layout must dequantize identically —
    the no-requantization loader path (loader.py)."""
    w_nk = RNG.standard_normal((64, 128)).astype(np.float32)  # stored [N, K]
    codes, scales, mins = q4_1_quantize(w_nk)
    qt = repack_codes_tpu(codes, scales, mins)
    ref = q4_1_dequantize(codes, scales, mins).T  # logical W[K, N]
    np.testing.assert_allclose(dequantize_tpu(qt), ref, atol=0)


def test_nibble_histogram():
    codes = np.array([[0, 0, 15, 8]], dtype=np.uint8)
    h = nibble_histogram(codes)
    assert h[0] == 2 and h[8] == 1 and h[15] == 1 and h.sum() == 4


def test_round_away_matches_c_roundf():
    """Bit parity of the quantizer's rounding with libm roundf — including
    the f32 binade-boundary trap: |x| + 0.5 computed IN f32 rounds
    0.49999997f up to 1.0 (exact tie at the 1.0 boundary) where roundf
    returns 0 (review r4)."""
    import ctypes
    import ctypes.util

    from bert_tpu.quant import _round_away

    libm = ctypes.CDLL(ctypes.util.find_library("m"))
    libm.roundf.restype = ctypes.c_float
    libm.roundf.argtypes = [ctypes.c_float]

    eps = np.float32(2.0 ** -25)
    edge = [0.5 - eps, -(0.5 - eps), 0.5, -0.5, 1.5, 2.5, -2.5,
            0.49999997, 1.4999999, 8388607.5, 0.0, -0.0]
    rng = np.random.default_rng(11)
    fuzz = (rng.standard_normal(4096) * rng.choice(
        [0.1, 1.0, 16.0, 1e4], size=4096)).astype(np.float32)
    xs = np.concatenate([np.asarray(edge, np.float32), fuzz])
    ours = _round_away(xs)
    ref = np.asarray([libm.roundf(ctypes.c_float(float(v))) for v in xs],
                     np.float32)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("ftype", [2, 3], ids=["q4_0", "q4_1"])
def test_quantize_on_load_matches_quantized_file(ftype, tmp_path):
    """The two documented-equivalent flows — quantize_ftype on a dense file
    vs loading a file written quantized — must agree BIT-exactly on every
    leaf, embedding tables included (review r4: on-load quantization used
    to skip the tables, which the reference's 2-D .*weight rule covers)."""
    from bert_tpu.formats import GgmlHParams, write_ggml
    from bert_tpu.loader import load_ggml_model
    from bert_tpu.params import BertConfig, random_named_tensors
    from fixture_vocab import build_fixture_tokens

    cfg = BertConfig(n_vocab=30522, n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=4, n_layer=2)
    named = random_named_tensors(cfg, seed=9)
    toks = build_fixture_tokens()
    args = (cfg.n_vocab, cfg.n_max_tokens, cfg.n_embd, cfg.n_intermediate,
            cfg.n_head, cfg.n_layer)
    write_ggml(str(tmp_path / "f32.bin"), GgmlHParams(*args, ftype=0),
               toks, named)
    write_ggml(str(tmp_path / "q.bin"), GgmlHParams(*args, ftype=ftype),
               toks, named)
    a = load_ggml_model(str(tmp_path / "f32.bin"), quantize_ftype=ftype)
    b = load_ggml_model(str(tmp_path / "q.bin"))
    fa = jax.tree_util.tree_leaves(a.params)
    fb = jax.tree_util.tree_leaves(b.params)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.parametrize("ftype", [2, 3])
def test_fused_stream_repack_matches_two_step(ftype):
    """repack_ggml_stream_tpu (the one-pass load path, VERDICT r4 #5) must
    be BIT-exact with unpack-then-repack on the same ggml block stream."""
    from bert_tpu.quant import repack_ggml_stream_tpu

    w_nk = RNG.standard_normal((96, 192)).astype(np.float32)  # stored [N,K]
    if ftype == 2:
        codes, scales = q4_0_quantize(w_nk)
        mins = None
    else:
        codes, scales, mins = q4_1_quantize(w_nk)
    raw = q4_to_ggml_bytes(codes, scales, mins)
    ref = repack_codes_tpu(*q4_from_ggml_bytes(raw, w_nk.shape, ftype))
    fused = repack_ggml_stream_tpu(raw, w_nk.shape, ftype)
    np.testing.assert_array_equal(fused.packed, ref.packed)
    np.testing.assert_array_equal(fused.scales, ref.scales)
    if ftype == 3:
        np.testing.assert_array_equal(fused.mins, ref.mins)


def test_concat_quant_n_matches_row_concat_repack():
    """Fusing QKV along N with a column permutation must equal the old
    path: concat stored rows, permute, then repack (loader.py QKV fuse)."""
    from bert_tpu.quant import concat_quant_n, repack_ggml_stream_tpu

    d = 64
    parts, code_list, scale_list = [], [], []
    for seed in range(3):
        w = np.random.default_rng(seed).standard_normal(
            (d, d)).astype(np.float32)
        codes, scales = q4_0_quantize(w)
        raw = q4_to_ggml_bytes(codes, scales, None)
        parts.append(repack_ggml_stream_tpu(raw, w.shape, 2))
        code_list.append(codes)
        scale_list.append(scales)
    order = np.random.default_rng(7).permutation(3 * d)
    fused = concat_quant_n(parts, col_order=order)
    ref = repack_codes_tpu(
        np.concatenate(code_list, axis=0)[order],
        np.concatenate(scale_list, axis=0)[order], None)
    np.testing.assert_array_equal(fused.packed, ref.packed)
    np.testing.assert_array_equal(fused.scales, ref.scales)

"""ggml-bin format tests: header/vocab/tensor-record round-trips for all four
ftypes, matching the reference's on-disk layout (SURVEY.md §2.4)."""

import struct

import numpy as np
import pytest

from bert_tpu.formats import GgmlHParams, read_ggml, write_ggml
from bert_tpu.params import BertConfig, expected_tensor_names, random_named_tensors

CFG = BertConfig(
    n_vocab=64, n_max_tokens=64, n_embd=64, n_intermediate=128,
    n_head=4, n_layer=2, ftype=0,
)


def _vocab_tokens(n):
    toks = [f"tok{i}" for i in range(n)]
    toks[0], toks[1], toks[2] = "[PAD]", "[CLS]", "[SEP]"
    toks[3] = "##sub"
    return toks


def _hparams(ftype):
    return GgmlHParams(
        n_vocab=CFG.n_vocab, n_max_tokens=CFG.n_max_tokens,
        n_embd=CFG.n_embd, n_intermediate=CFG.n_intermediate,
        n_head=CFG.n_head, n_layer=CFG.n_layer, ftype=ftype,
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3])
def test_roundtrip(tmp_path, ftype):
    named = random_named_tensors(CFG, seed=1)
    path = str(tmp_path / f"model_{ftype}.bin")
    write_ggml(path, _hparams(ftype), _vocab_tokens(CFG.n_vocab), named)

    mf = read_ggml(path)
    assert mf.hparams.ftype == ftype
    assert mf.hparams.n_embd == CFG.n_embd
    assert mf.vocab_tokens[:3] == ["[PAD]", "[CLS]", "[SEP]"]
    assert set(expected_tensor_names(CFG)) <= set(mf.tensors)

    # biases & LayerNorms are always f32, regardless of file ftype
    b = mf.tensors["encoder.layer.0.attention.self.query.bias"]
    assert b.ftype == 0
    np.testing.assert_allclose(
        b.to_f32(), named["encoder.layer.0.attention.self.query.bias"],
        atol=0,
    )

    # 2-D .weight tensors take the file dtype
    w = mf.tensors["encoder.layer.0.attention.self.query.weight"]
    assert w.ftype == ftype
    ref = named["encoder.layer.0.attention.self.query.weight"]
    if ftype == 0:
        np.testing.assert_allclose(w.to_f32(), ref, atol=0)
    elif ftype == 1:
        np.testing.assert_allclose(w.to_f32(), ref.astype(np.float16), atol=0)
    else:
        # quantized: bounded error
        assert np.abs(w.to_f32() - ref).max() < 0.1 * np.abs(ref).max() + 0.01


def test_header_layout(tmp_path):
    """Byte-level check of magic + hparams + vocab framing
    (convert-to-ggml.py:68-82, bert.cpp:344-402)."""
    named = random_named_tensors(CFG, seed=2)
    path = str(tmp_path / "m.bin")
    write_ggml(path, _hparams(0), _vocab_tokens(CFG.n_vocab), named)
    raw = open(path, "rb").read()
    assert struct.unpack("<I", raw[:4])[0] == 0x67676D6C
    hp = struct.unpack("<7i", raw[4:32])
    assert hp == (64, 64, 64, 128, 4, 2, 0)
    # first vocab entry
    ln = struct.unpack("<I", raw[32:36])[0]
    assert raw[36:36 + ln] == b"[PAD]"


def test_tensor_record_layout(tmp_path):
    """Tensor record header: n_dims, name_len, ftype, REVERSED dims, name."""
    named = {"w2.weight": np.arange(12, dtype=np.float32).reshape(3, 4)}
    hp = GgmlHParams(1, 1, 1, 1, 1, 1, 0)
    path = str(tmp_path / "t.bin")
    write_ggml(path, hp, ["x"], named)
    raw = open(path, "rb").read()
    off = 4 + 28 + 4 + 1  # magic + hparams + vocab(1 entry "x")
    n_dims, name_len, ftype = struct.unpack("<3i", raw[off:off + 12])
    assert (n_dims, name_len, ftype) == (2, len(b"w2.weight"), 0)
    ne = struct.unpack("<2i", raw[off + 12:off + 20])
    assert ne == (4, 3)  # numpy (3,4) stored reversed (ggml ne order)
    mf = read_ggml(path)
    np.testing.assert_array_equal(mf.tensors["w2.weight"].to_f32(),
                                  named["w2.weight"])


def test_q4_ne0_alignment_enforced(tmp_path):
    named = {"bad.weight": np.zeros((4, 40), np.float32)}  # ne[0]=40 % 64 != 0
    hp = GgmlHParams(1, 1, 1, 1, 1, 1, 2)
    with pytest.raises(ValueError, match="64"):
        write_ggml(str(tmp_path / "bad.bin"), hp, ["x"], named)


def test_bad_magic(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_ggml(str(p))


def test_truncated_files_raise(tmp_path):
    """Truncation anywhere (vocab or tensor section) either raises or
    yields an obviously-incomplete parse — never a silently complete model
    (reference behavior: hard error on short reads)."""
    named = random_named_tensors(CFG, seed=2)
    path = str(tmp_path / "full.bin")
    write_ggml(path, _hparams(0), _vocab_tokens(CFG.n_vocab), named)
    data = open(path, "rb").read()
    full = read_ggml(path)
    # cut inside the vocab section and inside the tensor section
    for frac in (0.001, 0.5):
        cut = str(tmp_path / f"cut_{frac}.bin")
        with open(cut, "wb") as f:
            f.write(data[: int(len(data) * frac)])
        try:
            mf = read_ggml(cut)
        except Exception:
            continue  # raising is the preferred outcome
        assert len(mf.tensors) < len(full.tensors), (
            "truncated file parsed as complete")


def test_mmap_and_stream_readers_agree(tmp_path):
    """read_ggml's zero-copy mmap path (the default, VERDICT r4 #5) must
    produce byte-identical tensors to the streaming fallback."""
    from bert_tpu.formats.ggml_bin import read_ggml

    path = str(tmp_path / "m.bin")
    cfg = BertConfig(n_vocab=64, n_max_tokens=64, n_embd=64,
                     n_intermediate=128, n_head=2, n_layer=1)
    hp = GgmlHParams(cfg.n_vocab, cfg.n_max_tokens, cfg.n_embd,
                     cfg.n_intermediate, cfg.n_head, cfg.n_layer, ftype=3)
    toks = [f"t{i}" for i in range(cfg.n_vocab)]
    write_ggml(path, hp, toks, random_named_tensors(cfg, 3))

    a, b = read_ggml(path, mmap=True), read_ggml(path, mmap=False)
    assert a.vocab_tokens == b.vocab_tokens
    assert a.hparams == b.hparams
    assert set(a.tensors) == set(b.tensors)
    for name, ra in a.tensors.items():
        rb = b.tensors[name]
        assert (ra.shape, ra.ftype) == (rb.shape, rb.ftype)
        np.testing.assert_array_equal(ra.to_f32(), rb.to_f32())
        if ra.ftype in (2, 3):  # lazy q4 fields agree too
            np.testing.assert_array_equal(ra.codes, rb.codes)
            np.testing.assert_array_equal(ra.scales, rb.scales)

"""Native tokenizer tests: build, goldens, and Python↔C++ fuzz equivalence."""

import random
import string

import numpy as np

import pytest

from bert_tpu.native import NativeWordPiece, build_native
from bert_tpu.tokenizer import WordPieceTokenizer
from fixture_vocab import GOLDEN_CASES, build_fixture_vocab

pytestmark = pytest.mark.skipif(
    build_native() is None, reason="no C++ toolchain available"
)


@pytest.fixture(scope="module")
def vocab():
    return build_fixture_vocab()


@pytest.fixture(scope="module")
def native(vocab):
    return NativeWordPiece(vocab.tokens, vocab.cls_id, vocab.sep_id)


@pytest.fixture(scope="module")
def py_tok(vocab):
    return WordPieceTokenizer(vocab, warn_unknown=False, use_native=False)


@pytest.mark.parametrize("case", range(len(GOLDEN_CASES)))
def test_native_goldens(native, case):
    text, expected = GOLDEN_CASES[case]
    assert native.tokenize(text, 512) == expected


def test_native_truncation(native, vocab):
    ids = native.tokenize(" ".join(["go"] * 100), 16)
    assert len(ids) == 16
    assert ids[0] == vocab.cls_id and ids[-1] == vocab.sep_id


def test_batch_api(native, py_tok):
    texts = ["the store", "don't go anywhere", "Québec", ""]
    batched = native.tokenize_batch(texts, 32)
    for text, ids in zip(texts, batched):
        assert ids == py_tok.tokenize(text, 32)


def test_batch_threaded_matches_single(native, py_tok):
    """The thread-pooled batch path (GIL released per slice) must be
    bit-identical to single-threaded and Python — including slice
    boundaries (uneven splits, empty strings)."""
    texts = (["the store", "", "don't go anywhere", "Québec city",
              "going going going"] * 41)[:203]
    one = native.tokenize_batch(texts, 32, n_threads=1)
    for nt in (2, 3, 8):
        assert native.tokenize_batch(texts, 32, n_threads=nt) == one
    assert one[:5] == [py_tok.tokenize(t, 32) for t in texts[:5]]


def test_fuzz_equivalence(native, py_tok):
    """Random strings (ASCII + accents + unicode + whitespace soup) must
    tokenize identically in Python and C++."""
    alphabet = (string.ascii_letters + string.digits + string.punctuation
                + "  \t\n" + "àéîõüÀÉÎÕÜçÇñÑ" + "日本語😀ø")
    rng = random.Random(0)
    for trial in range(500):
        n = rng.randint(0, 40)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        cap = rng.choice([8, 32, 512])
        py = py_tok.tokenize(s, cap)
        nat = native.tokenize(s, cap)
        assert py == nat, f"mismatch on {s!r} cap={cap}: {py} vs {nat}"


def test_engine_uses_native_when_available(vocab):
    tok = WordPieceTokenizer(vocab, use_native=True)
    assert tok._native is not None
    assert tok.tokenize("Québec", 512) == [101, 5447, 102]


def test_degenerate_caps_do_not_overflow(native, py_tok, vocab):
    """n_max_tokens <= 1 must not write past the caller's buffer (the cap
    guard used to only protect word pieces, not [CLS]/[SEP])."""
    for text in ["hello world", "a b c d e f g h"]:
        assert native.tokenize(text, 1) == [vocab.cls_id]
        assert py_tok.tokenize(text, 1) == [vocab.cls_id]
        two = native.tokenize(text, 2)
        assert len(two) == 2 and two[0] == vocab.cls_id \
            and two[-1] == vocab.sep_id
        assert two == py_tok.tokenize(text, 2)


def test_lone_surrogate_does_not_crash_native(native, py_tok, vocab):
    """A lone surrogate (legal in a Python str, e.g. from json.loads of
    a \\ud800 escape) must tokenize on BOTH cores without raising — the
    native path previously died in .encode('utf-8') and failed a whole
    server micro-batch (review r4)."""
    s = "the " + chr(0xD800) + " store"
    out_py = py_tok.tokenize(s, 64)
    out_nat = native.tokenize(s, 64)
    # the unencodable char degrades to an unknown and is dropped;
    # outputs stay well-formed and the two cores agree
    assert out_nat[0] == vocab.cls_id and out_nat[-1] == vocab.sep_id
    assert out_py == py_tok.tokenize("the store", 64)
    assert out_nat == out_py


@pytest.mark.parametrize("ftype,meta", [(2, 4), (3, 8)])
def test_native_repack_matches_numpy(ftype, meta):
    """csrc/q4repack.cpp must be BIT-exact with the numpy fused repack
    (which is itself pinned against the two-step unpack+repack path)."""
    from bert_tpu.native import native_q4_repack
    from bert_tpu.quant import (
        q4_0_quantize,
        q4_1_quantize,
        q4_to_ggml_bytes,
    )

    if native_q4_repack(np.zeros(40, np.uint8), 1, 64, 4) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(11)
    n, k = 96, 320  # non-square, multiple tiles when TILE < n not needed
    w = rng.standard_normal((n, k)).astype(np.float32)
    if ftype == 2:
        codes, scales = q4_0_quantize(w)
        mins = None
    else:
        codes, scales, mins = q4_1_quantize(w)
    raw = np.frombuffer(q4_to_ggml_bytes(codes, scales, mins), np.uint8)

    got = native_q4_repack(raw, n, k, meta)
    assert got is not None
    # numpy reference: force the fallback by calling the module internals
    import bert_tpu.quant as q

    ref_packed = q.pack_tpu_layout(np.ascontiguousarray(codes.T))
    np.testing.assert_array_equal(got[0], ref_packed)
    np.testing.assert_array_equal(got[1],
                                  np.ascontiguousarray(scales.T))
    if ftype == 3:
        np.testing.assert_array_equal(got[2],
                                      np.ascontiguousarray(mins.T))


def test_native_repack_rejects_bad_args():
    from bert_tpu.native import native_q4_repack

    if native_q4_repack(np.zeros(40, np.uint8), 1, 64, 4) is None:
        pytest.skip("native lib unavailable")
    # k not a multiple of 64 → C returns -1 → None (sized correctly so
    # the size gate doesn't mask the C-side validation)
    assert native_q4_repack(np.zeros(20, np.uint8), 1, 32, 4) is None
    assert native_q4_repack(np.zeros(42, np.uint8), 1, 64, 5) is None
    # undersized stream must be refused BEFORE the C call reads past the
    # end (review r5: the old availability probe itself overread 20
    # bytes past a 20-byte buffer)
    assert native_q4_repack(np.zeros(39, np.uint8), 1, 64, 4) is None

"""Streaming corpus-scale encode (engine.eval_tokens_iter / encode_iter,
VERDICT r2 #3): input-order blocks, bulk-path-identical results, and —
the point of the API — bounded in-flight device memory for corpora much
larger than max_batch × window."""

import gc
import weakref

import numpy as np
import pytest

from bert_tpu.engine import BertTPU
from bert_tpu.loader import LoadedModel
from bert_tpu.params import (
    BertConfig,
    params_from_named_tensors,
    random_named_tensors,
)
from fixture_vocab import build_fixture_vocab

CFG = BertConfig(n_vocab=30522, n_max_tokens=64, n_embd=64,
                 n_intermediate=128, n_head=4, n_layer=2)


@pytest.fixture(scope="module")
def eng():
    loaded = LoadedModel(
        config=CFG,
        params=params_from_named_tensors(random_named_tensors(CFG, 3), CFG),
        vocab=build_fixture_vocab(),
    )
    return BertTPU(loaded, max_batch=16, pack_seq=32)


@pytest.fixture(scope="module")
def corpus(eng):
    words = ["going", "to", "the", "store", "buy", "apples", "time",
             "cloudy", "welcome", "come", "along", "soon"]
    rng = np.random.default_rng(7)
    texts = [" ".join(rng.choice(words, size=int(k)))
             for k in rng.integers(2, 40, size=230)]
    return texts, [eng.tokenize(t) for t in texts]


def test_streaming_matches_bulk(eng, corpus):
    texts, toks = corpus
    bulk = eng.eval_tokens(toks)
    blocks = list(eng.eval_tokens_iter(toks, window=64))
    assert [len(b) for b in blocks] == [64, 64, 64, 38]
    stream = np.concatenate(blocks)
    # identical routing within each window → fp-identical to evaluating
    # that window in bulk; vs the full-corpus bulk pass, batch composition
    # differs, so compare semantically
    cos = np.sum(stream * bulk, axis=-1)
    assert np.all(cos > 0.9999), cos.min()


def test_encode_iter_matches_encode_batch(eng, corpus):
    texts, _ = corpus
    blocks = list(eng.encode_iter(texts, window=100))
    stream = np.concatenate(blocks)
    assert stream.shape == (len(texts), CFG.n_embd)
    ref = eng.encode_batch(texts[:100])
    np.testing.assert_allclose(blocks[0], ref, atol=1e-6)


@pytest.mark.parametrize("depth", [2, 4])
def test_streaming_bounds_inflight_buffers(eng, corpus, depth):
    """At most ``depth`` windows of device buffers live at once: once
    window i+depth has been dispatched, window i's result arrays must
    already be collectible (gathered + released). depth=4 is the engine
    default (round-5 probe), depth=2 the memory-lean setting."""
    _, toks = corpus
    window_refs = []
    orig = eng._dispatch_all

    def spy(tl):
        pending = orig(tl)
        window_refs.append([weakref.ref(emb) for _, emb, _ in pending])
        return pending

    eng._dispatch_all = spy
    try:
        blocks = []
        for i, blk in enumerate(eng.eval_tokens_iter(toks, window=32,
                                                     depth=depth)):
            blocks.append(blk)
            if i >= depth:
                gc.collect()
                dead = [r() is None for r in window_refs[i - depth]]
                assert all(dead), (i, dead)
    finally:
        eng._dispatch_all = orig
    assert sum(len(b) for b in blocks) == len(toks)


def test_streaming_single_window_and_empty(eng, corpus):
    _, toks = corpus
    assert list(eng.eval_tokens_iter([], window=16)) == []
    blocks = list(eng.eval_tokens_iter(toks[:5], window=1000))
    assert len(blocks) == 1 and blocks[0].shape == (5, CFG.n_embd)
    with pytest.raises(ValueError):
        next(eng.eval_tokens_iter(toks, window=0))


@pytest.mark.parametrize("depth", [1, 3, 4])
def test_pipeline_depth_matches_default(eng, corpus, depth):
    """Any pipeline depth (VERDICT r4 #3: deeper pipelines hide the
    tunnel's fixed per-transfer cost) must yield the exact same blocks in
    the same order as a depth-2 pipeline."""
    texts, toks = corpus
    ref = list(eng.eval_tokens_iter(toks, window=64, depth=2))
    got = list(eng.eval_tokens_iter(toks, window=64, depth=depth))
    assert [len(b) for b in got] == [len(b) for b in ref]
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)
    # encode_iter threads depth through identically
    got_t = list(eng.encode_iter(texts, window=100, depth=depth))
    ref_t = list(eng.encode_iter(texts, window=100))
    for a, b in zip(got_t, ref_t):
        np.testing.assert_array_equal(a, b)


def test_depth_validation(eng, corpus):
    _, toks = corpus
    with pytest.raises(ValueError):
        list(eng.eval_tokens_iter(toks, window=64, depth=0))

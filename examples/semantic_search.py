#!/usr/bin/env python
"""Semantic-search REPL over a text corpus — counterpart of the reference's
examples/sample_dylib.py (its ctypes consumer): embed a corpus, then answer
queries by cosine top-k. Here the engine is consumed through its Python API
(the TPU framework's equivalent of the C ABI surface; see README \"API map\").

Usage:
  python examples/semantic_search.py -m <model.bin-or-hf-dir> [corpus.txt]

Without a corpus file, a small built-in demo corpus is used.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# tiny built-in fallback; the shipped default is examples/corpus.txt
# (1,300+ original lines across ten topics — the counterpart of the
# reference's examples/sample_client_texts.txt demo corpus)
DEMO_CORPUS = [
    "The store opens at nine in the morning.",
    "Apples and bananas are on sale today.",
    "You're welcome to come along if you'd like.",
    "The weather is partly cloudy outside.",
    "He will be back soon, so don't go anywhere.",
    "The time is 2:30 p.m. on a Tuesday.",
    "Postfix expressions are evaluated with a stack.",
    "Push and pop are the two stack operations.",
    "Going to the market to buy three apples.",
    "It is sunny with a light breeze.",
]

CORPUS_TXT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "corpus.txt")


def _default_corpus():
    if os.path.exists(CORPUS_TXT):
        with open(CORPUS_TXT, encoding="utf-8") as f:
            return [ln.strip() for ln in f if ln.strip()]
    return DEMO_CORPUS


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("corpus", nargs="?", default=None)
    ap.add_argument("-k", type=int, default=3)
    ap.add_argument("--pooling", choices=["mean", "cls"], default=None,
                    help="cls for BGE-family models (HF dirs auto-detect)")
    args = ap.parse_args()

    from bert_tpu import BertTPU

    model = BertTPU.from_file(args.model, pooling=args.pooling)
    if args.corpus:
        with open(args.corpus, encoding="utf-8") as f:
            texts = [ln.strip() for ln in f if ln.strip()]
    else:
        texts = _default_corpus()
    print(f"embedding corpus of {len(texts)} lines ...")
    t0 = time.time()
    # streaming windows (engine.encode_iter): O(window) memory however
    # large the corpus file is — the reference's per-sentence loop
    # (bert.cpp:1014-1020) handled million-line corpora in O(1); this
    # keeps that property at the TPU bulk rate
    corpus_emb = np.concatenate(
        list(model.encode_iter(texts, window=4096)))  # [N, D], L2-normalized
    print(f"done in {time.time() - t0:.2f}s")

    while True:
        try:
            query = input("query> ").strip()
        except EOFError:
            break
        if not query:
            break
        t0 = time.time()
        q = model.encode(query)
        sims = corpus_emb @ q  # cosine (all L2-normalized)
        top = np.argsort(-sims)[: args.k]
        dt = time.time() - t0
        for i in top:
            print(f"  {sims[i]:.4f}  {texts[i]}")
        print(f"  ({dt * 1000:.1f} ms)")


if __name__ == "__main__":
    main()

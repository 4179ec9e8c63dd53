#!/usr/bin/env python
"""Generate a similarity-labeled sentence-pair TSV from the fixture vocab —
an OFFLINE stand-in for the STSBenchmark test split (zero-egress boxes).

Pairs share a controlled fraction of their words; the gold score is that
overlap fraction scaled to STSB's 0-5 range. Any encoder whose embeddings
reflect lexical content scores a high cosine-Spearman on this set, so it
exercises the exact eval_sts_local.py → results/ → print_tables.py
pipeline the real MTEB run uses (docs/MTEB.md has the connected-machine
runbook).

Usage: python benchmarks/make_synthetic_sts.py [-n 512] [-o pairs.tsv]
"""
import argparse
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def make_pairs(n: int, seed: int = 0):
    from fixture_vocab import KNOWN_TOKENS

    words = sorted(w for w in KNOWN_TOKENS
                   if w.isalpha() and len(w) > 1 and not w.startswith("["))
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        k = int(rng.integers(6, 14))
        base = rng.choice(words, size=k)
        keep = float(rng.random())  # overlap fraction = gold signal
        n_keep = int(round(keep * k))
        replaced = base.copy()
        swap_idx = rng.choice(k, size=k - n_keep, replace=False)
        replaced[swap_idx] = rng.choice(words, size=k - n_keep)
        rng.shuffle(replaced)
        rows.append((" ".join(base), " ".join(replaced),
                     round(5.0 * n_keep / k, 3)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=512, help="number of pairs")
    ap.add_argument("-o", "--out", default="/tmp/synthetic_sts.tsv")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rows = make_pairs(args.n, args.seed)
    with open(args.out, "w", encoding="utf-8") as f:
        for s1, s2, score in rows:
            f.write(f"{s1}\t{s2}\t{score}\n")
    print(f"wrote {len(rows)} pairs to {args.out}")


if __name__ == "__main__":
    main()

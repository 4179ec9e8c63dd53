#!/usr/bin/env python
"""Offline STS evaluation — the MTEB STSBenchmark protocol without the
`mteb` package or network access.

Input: a TSV file with ``sentence1<TAB>sentence2<TAB>score`` per line
(STSB's own format; any similarity-labeled pair set works). The metric is
the same one MTEB reports for STSB (cosine-similarity Spearman,
benchmarks/print_tables.py extracts `cos_sim.spearman`), plus wall time —
so numbers line up with the reference's README tables when run on the
real STSB test split.

Usage:
  python benchmarks/eval_sts_local.py -m model.bin pairs.tsv [--mode q4_0]

Writes results/<model>_<mode>/STSLocal.json in the same shape
print_tables.py parses.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval_common import read_sts_pairs as read_pairs  # noqa: E402 (shared parser)


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    """Spearman rank correlation (average ranks for ties), numpy-only."""
    def rank(x):
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x), dtype=np.float64)
        sx = x[order]
        i = 0
        while i < len(x):
            j = i
            while j + 1 < len(x) and sx[j + 1] == sx[i]:
                j += 1
            ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
            i = j + 1
        return ranks
    ra, rb = rank(np.asarray(a, np.float64)), rank(np.asarray(b, np.float64))
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / denom) if denom else 0.0


def main() -> None:
    from eval_common import (
        ARCHS,
        DATA_DIR,
        MODES,
        default_fixture_model,
        make_engine,
        result_dir,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model",
                    help="ggml-bin file / HF dir / .npz cache")
    ap.add_argument("--fixture", action="store_true",
                    help="build the offline random-weight fixture model "
                    "(vocab derived from the dataset)")
    ap.add_argument("--arch", default="minilm_l6", choices=sorted(ARCHS),
                    help="fixture model architecture (VERDICT r3 #4: the "
                    "reference's largest quant deltas are on bert-base)")
    ap.add_argument("pairs", nargs="?",
                    default=os.path.join(DATA_DIR, "sts_en.tsv"),
                    help="TSV: sentence1<TAB>sentence2<TAB>score "
                    "(default: the committed original English pair set)")
    ap.add_argument("--mode", default="q4_0", choices=MODES,
                    help="engine configuration (eval_common.make_engine)")
    ap.add_argument("--pooling", default="mean", choices=["mean", "cls"],
                    help="cls = BGE-family semantics: quant noise lands on "
                    "one token's vector instead of averaging out")
    ap.add_argument("--max-batch", type=int, default=1024)
    args = ap.parse_args()

    s1, s2, gold = read_pairs(args.pairs)
    if args.fixture:
        args.model = default_fixture_model(args.arch)
    elif not args.model:
        ap.error("need -m MODEL or --fixture")

    model = make_engine(args.model, args.mode, max_batch=args.max_batch,
                        pooling=args.pooling)
    model.encode_batch(s1[:8] + s2[:8])  # warm the shape set

    t0 = time.time()
    emb = model.encode_batch(s1 + s2)
    dt = time.time() - t0
    e1, e2 = emb[: len(s1)], emb[len(s1):]
    sims = (e1 * e2).sum(-1)  # embeddings are L2-normalized
    rho = spearman(sims, gold)
    n_sent = 2 * len(s1)
    print(f"{len(s1)} pairs: cosine-Spearman {rho:.5f}, "
          f"eval {dt:.2f}s ({n_sent / dt:.0f} sentences/s)")

    import jax

    out_dir = result_dir(args.model, args.mode, pooling=args.pooling,
                         backend=jax.default_backend())
    task = ("STSLocalEn"
            if os.path.basename(args.pairs) == "sts_en.tsv" else "STSLocal")
    payload = {
        "test": {"cos_sim": {"spearman": rho},
                 "evaluation_time": round(dt, 2)},
        "n_pairs": len(s1),
        "backend": jax.default_backend(),  # result provenance
        "pooling": args.pooling,
    }
    if args.mode == "f16":
        payload["compute_note"] = ("mode 'f16' is the reference label; on "
                                   "TPU the compute dtype is bfloat16")
    with open(os.path.join(out_dir, f"{task}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"results in {out_dir}")


if __name__ == "__main__":
    main()

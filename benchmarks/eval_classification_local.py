#!/usr/bin/env python
"""Offline classification evaluation — the MTEB Classification protocol
(EmotionClassification analog) without the `mteb` package or network.

Protocol (matching mteb's kLogReg classification evaluator): embed every
sentence once, then run stratified k-fold cross-validation with a
logistic-regression probe (sklearn, the same estimator MTEB uses), and
report the mean fold accuracy as ``main_score`` — the exact field
benchmarks/print_tables.py extracts for classification tasks, so these
results drop into the same tables as the reference's
(/root/reference/benchmarks/results/*_*/EmotionClassification.json).

k-fold rather than a single split (VERDICT r3 #3): with the 600-line
committed set every item is tested exactly once across the k folds, so
accuracy resolution is 1/600 ≈ 0.17 points — fine enough to see the
~1.7-point quantization deltas the reference's parity budget is about
(BASELINE.md bert-base rows). The old single even/odd split tested 90
items (1.1-point granularity, four of five modes identical).

Input: a ``label<TAB>text`` TSV (default: the committed original English
emotion set, benchmarks/data/emotion_en.tsv — 6 classes matching the MTEB
task's label space, 100 original sentences per class). Folds are
deterministic and stratified (within each class, item i goes to fold i%k).

Usage:
  python benchmarks/eval_classification_local.py -m model.bin [--mode q4_0]
  python benchmarks/eval_classification_local.py --fixture [--mode int8]

``--fixture`` builds the offline random-weight MiniLM-L6-shaped model with
an eval vocab covering the dataset (benchmarks/eval_common.py), writing
results under results/fixture-minilm-l6_<mode>/.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval_common import (  # noqa: E402
    ARCHS,
    DATA_DIR,
    MODES,
    default_fixture_model,
    make_engine,
    read_labeled,
    result_dir,
)


def stratified_folds(labels, k):
    """Deterministic stratified folds: within each class (sorted), item i
    goes to fold i % k. Returns a list of k index lists."""
    by_class = {}
    for i, lab in enumerate(labels):
        by_class.setdefault(lab, []).append(i)
    folds = [[] for _ in range(k)]
    for lab in sorted(by_class):
        for j, idx in enumerate(by_class[lab]):
            folds[j % k].append(idx)
    return folds


def logreg_accuracy(x_train, y_train, x_test, y_test, seed=42) -> float:
    """MTEB's classification probe: sklearn LogisticRegression on the
    embeddings (mteb kLogReg evaluator protocol)."""
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=1000, random_state=seed)
    clf.fit(x_train, y_train)
    return float(np.mean(clf.predict(x_test) == np.asarray(y_test)))


def kfold_accuracy(emb, labels, k=5, seed=42):
    """Mean accuracy over stratified k-fold CV; every item is tested
    exactly once. Returns (mean, per-fold list, n_tested)."""
    labels = list(labels)
    folds = stratified_folds(labels, k)
    scores = []
    n_tested = 0
    for held_out in folds:
        train = [i for f in folds if f is not held_out for i in f]
        scores.append(logreg_accuracy(
            emb[train], [labels[i] for i in train],
            emb[held_out], [labels[i] for i in held_out], seed=seed))
        n_tested += len(held_out)
    return float(np.mean(scores)), scores, n_tested


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model",
                    help="ggml-bin file / HF dir / .npz cache")
    ap.add_argument("--fixture", action="store_true",
                    help="build the offline random-weight fixture model "
                    "(vocab derived from the dataset)")
    ap.add_argument("--arch", default="minilm_l6", choices=sorted(ARCHS),
                    help="fixture model architecture (VERDICT r3 #4: the "
                    "reference's largest quant deltas are on bert-base)")
    ap.add_argument("data", nargs="?",
                    default=os.path.join(DATA_DIR, "emotion_en.tsv"),
                    help="label<TAB>text TSV")
    ap.add_argument("--mode", default="q4_0", choices=MODES)
    ap.add_argument("--pooling", default="mean", choices=["mean", "cls"],
                    help="cls = BGE-family semantics (eval_common)")
    ap.add_argument("--max-batch", type=int, default=1024)
    ap.add_argument("--task-name", default="EmotionLocal")
    ap.add_argument("-k", "--folds", type=int, default=5)
    args = ap.parse_args()

    labels, texts = read_labeled(args.data)
    if args.fixture:
        args.model = default_fixture_model(args.arch)
    elif not args.model:
        ap.error("need -m MODEL or --fixture")

    model = make_engine(args.model, args.mode, max_batch=args.max_batch,
                        pooling=args.pooling)
    model.encode_batch(texts[:8])  # warm the shape set

    t0 = time.time()
    emb = model.encode_batch(texts)
    dt = time.time() - t0

    acc, per_fold, n_tested = kfold_accuracy(emb, labels, k=args.folds)
    print(f"{len(texts)} sentences ({len(set(labels))} classes): "
          f"{args.folds}-fold accuracy {acc:.5f} "
          f"(folds {' '.join(f'{s:.4f}' for s in per_fold)}), "
          f"eval {dt:.2f}s ({len(texts) / dt:.0f} sentences/s)")

    import jax

    out_dir = result_dir(args.model, args.mode, pooling=args.pooling,
                         backend=jax.default_backend())
    payload = {
        "test": {"main_score": acc, "accuracy": acc,
                 "evaluation_time": round(dt, 2)},
        "k_folds": args.folds,
        "scores_per_fold": [round(s, 5) for s in per_fold],
        "n_test": n_tested,  # every item held out exactly once
        "classes": sorted(set(labels)),
        "backend": jax.default_backend(),  # result provenance
        "pooling": args.pooling,
    }
    if args.mode == "f16":
        payload["compute_note"] = ("mode 'f16' is the reference label; on "
                                   "TPU the compute dtype is bfloat16")
    with open(os.path.join(out_dir, f"{args.task_name}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"results in {out_dir}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Offline classification evaluation — the MTEB Classification protocol
(EmotionClassification analog) without the `mteb` package or network.

Protocol (matching mteb's kLogReg classification evaluator): embed train
and test sentences, fit a logistic-regression probe on train embeddings
(sklearn, the same estimator MTEB uses), report test accuracy as
``main_score`` — the exact field benchmarks/print_tables.py extracts for
classification tasks, so these results drop into the same tables as the
reference's (/root/reference/benchmarks/results/*_*/EmotionClassification.json).

Input: a ``label<TAB>text`` TSV (default: the committed original English
emotion set, benchmarks/data/emotion_en.tsv — 6 classes matching the MTEB
task's label space). The train/test split is deterministic and stratified
(within each class: even positions train, odd test).

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
    DATA_DIR,
    MODES,
    default_fixture_model,
    make_engine,
    read_labeled,
    result_dir,
)


def split_stratified(labels, texts):
    """Deterministic per-class even/odd split → (train_idx, test_idx)."""
    by_class = {}
    for i, lab in enumerate(labels):
        by_class.setdefault(lab, []).append(i)
    train, test = [], []
    for lab in sorted(by_class):
        idxs = by_class[lab]
        train.extend(idxs[0::2])
        test.extend(idxs[1::2])
    return train, test


def logreg_accuracy(x_train, y_train, x_test, y_test, seed=42) -> float:
    """MTEB's classification probe: sklearn LogisticRegression on the
    embeddings (mteb kLogReg evaluator protocol)."""
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=1000, random_state=seed)
    clf.fit(x_train, y_train)
    return float(np.mean(clf.predict(x_test) == np.asarray(y_test)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model",
                    help="ggml-bin file / HF dir / .npz cache")
    ap.add_argument("--fixture", action="store_true",
                    help="build the offline random-weight fixture model "
                    "(vocab derived from the dataset)")
    ap.add_argument("data", nargs="?",
                    default=os.path.join(DATA_DIR, "emotion_en.tsv"),
                    help="label<TAB>text TSV")
    ap.add_argument("--mode", default="q4_0", choices=MODES)
    ap.add_argument("--max-batch", type=int, default=1024)
    ap.add_argument("--task-name", default="EmotionLocal")
    args = ap.parse_args()

    labels, texts = read_labeled(args.data)
    if args.fixture:
        args.model = default_fixture_model()
    elif not args.model:
        ap.error("need -m MODEL or --fixture")

    model = make_engine(args.model, args.mode, max_batch=args.max_batch)
    model.encode_batch(texts[:8])  # warm the shape set

    t0 = time.time()
    emb = model.encode_batch(texts)
    dt = time.time() - t0

    train_idx, test_idx = split_stratified(labels, texts)
    acc = logreg_accuracy(emb[train_idx], [labels[i] for i in train_idx],
                          emb[test_idx], [labels[i] for i in test_idx])
    print(f"{len(texts)} sentences ({len(set(labels))} classes): "
          f"accuracy {acc:.5f}, eval {dt:.2f}s "
          f"({len(texts) / dt:.0f} sentences/s)")

    out_dir = result_dir(args.model, args.mode)
    payload = {
        "test": {"main_score": acc, "accuracy": acc,
                 "evaluation_time": round(dt, 2)},
        "n_train": len(train_idx), "n_test": len(test_idx),
        "classes": sorted(set(labels)),
    }
    if args.mode == "f16":
        payload["compute_note"] = ("mode 'f16' is the reference label; on "
                                   "TPU the compute dtype is bfloat16")
    with open(os.path.join(out_dir, f"{args.task_name}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(f"results in {out_dir}")


if __name__ == "__main__":
    main()

"""Unit layer for the offline quality evaluators (no engine, no model):
the k-fold classification protocol (VERDICT r3 #3) and the committed
emotion dataset's statistical power.

Reference anchor: /root/reference/benchmarks/run_mteb.py:22-25
(EmotionClassification) — the reference's parity budget on this task is
~1.7 accuracy points (BASELINE.md), so the evaluator's resolution must be
well under that.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

from eval_classification_local import (  # noqa: E402
    kfold_accuracy,
    stratified_folds,
)
from eval_common import DATA_DIR, read_labeled  # noqa: E402


def test_stratified_folds_partition_and_balance():
    labels = ["a"] * 10 + ["b"] * 10 + ["c"] * 10
    folds = stratified_folds(labels, 5)
    # exact partition: every index exactly once
    flat = sorted(i for f in folds for i in f)
    assert flat == list(range(30))
    # per-class balance: each fold holds 2 of each class
    for f in folds:
        for lab in "abc":
            assert sum(labels[i] == lab for i in f) == 2


def test_kfold_separable_data_scores_one():
    # three classes on orthogonal axes + tiny noise: a linear probe must
    # get them all right, and every item must be tested exactly once
    rng = np.random.default_rng(0)
    n_per, d = 20, 8
    emb, labels = [], []
    for c in range(3):
        x = rng.normal(0, 0.05, size=(n_per, d))
        x[:, c] += 1.0
        emb.append(x)
        labels += [f"c{c}"] * n_per
    emb = np.concatenate(emb)
    acc, per_fold, n_tested = kfold_accuracy(emb, labels, k=5)
    assert acc == 1.0
    assert len(per_fold) == 5
    assert n_tested == 3 * n_per


def test_kfold_random_labels_near_chance():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(120, 16))
    labels = [f"c{i % 4}" for i in range(120)]  # 4 classes, chance 0.25
    acc, _, _ = kfold_accuracy(emb, labels, k=5)
    assert acc < 0.45  # no signal → near chance, never near 1


def test_emotion_dataset_power():
    """The committed set must be large and balanced enough that k-fold
    accuracy resolution (1/n) is well below the ~1.7-point reference
    parity budget (VERDICT r3 #3: the old 90-item split could not see
    quantization effects at all)."""
    labels, texts = read_labeled(os.path.join(DATA_DIR, "emotion_en.tsv"))
    assert len(texts) >= 600
    counts = {}
    for lab in labels:
        counts[lab] = counts.get(lab, 0) + 1
    assert sorted(counts) == ["anger", "fear", "joy", "love", "sadness",
                              "surprise"]
    assert min(counts.values()) >= 100
    assert len(set(texts)) == len(texts), "duplicate sentences"
    # resolution: every item tested once across folds
    assert 1.0 / len(texts) <= 0.005  # ≤0.5 accuracy points (ask: ≤0.5)

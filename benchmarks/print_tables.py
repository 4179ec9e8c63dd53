#!/usr/bin/env python
"""Render benchmarks/results/*/{task}.json into the README markdown tables
(same score extraction as the reference's benchmarks/print_tables.py:
cos_sim.spearman for STS tasks, main_score otherwise, plus
evaluation_time)."""
import glob
import os
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from results_common import extract_score as extract  # noqa: E402
from results_common import split_model_mode  # noqa: E402

RESULTS = os.path.join(HERE, "results")


def main(results_dir: str = None) -> None:
    if results_dir is None:
        results_dir = sys.argv[1] if len(sys.argv) > 1 else RESULTS
    # known modes, longest first so q4_0/q4_1 split before a bare '_0'
    known_modes = ("sbert-batchless", "sbert", "q4_0", "q4_1", "f32", "f16")
    rows = defaultdict(dict)  # model -> mode -> {task: (score, time)}
    for res_dir in sorted(glob.glob(os.path.join(results_dir, "*"))):
        name = os.path.basename(res_dir)
        split = split_model_mode(name, known_modes)
        model, mode = split if split else name.rpartition("_")[::2]
        for task_json in glob.glob(os.path.join(res_dir, "*.json")):
            task = os.path.splitext(os.path.basename(task_json))[0]
            rows[model].setdefault(mode, {})[task] = extract(task_json)

    for model, modes in rows.items():
        tasks = sorted({t for m in modes.values() for t in m})
        print(f"\n### {model}\n")
        header = "| mode | " + " | ".join(
            f"{t} score | {t} time (s)" for t in tasks) + " |"
        print(header)
        print("|" + "---|" * (1 + 2 * len(tasks)))
        for mode, results in sorted(modes.items()):
            cells = []
            for t in tasks:
                score, dt = results.get(t, (None, None))
                cells.append("" if score is None else f"{score:.4f}")
                cells.append("" if dt is None else f"{dt:.2f}")
            print("| " + mode + " | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()

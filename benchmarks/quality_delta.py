#!/usr/bin/env python
"""CPU↔TPU quality delta tables (VERDICT r4 #1).

Reads the committed offline quality results in benchmarks/results/ —
plain `<model>_<mode>` dirs are the forced-CPU f32-numerics tier,
`<model>@tpu_<mode>` dirs the production TPU tier (bf16 compute, Pallas
kernels, f16 wire) — and emits one markdown table per model with, for
each mode × task: the TPU score, the CPU score, and the delta. Flags any
|delta| above the threshold (default 0.005 = the reference parity
budget's 0.5-point resolution on these metrics).

Usage: python benchmarks/quality_delta.py [--threshold 0.005]
Exit code 1 if any pair exceeds the threshold (usable as a gate).
"""
import argparse
import glob
import json
import os
import sys
from collections import defaultdict

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

MODES = ("f32", "f16", "q4_0", "q4_1", "int8")


def load_scores():
    """{(model, backend): {mode: {task: score}}}"""
    out = defaultdict(lambda: defaultdict(dict))
    for res_dir in sorted(glob.glob(os.path.join(RESULTS, "*_*"))):
        name = os.path.basename(res_dir)
        for mode in MODES:
            if name.endswith("_" + mode):
                model = name[: -len(mode) - 1]
                break
        else:
            continue
        backend = "cpu"
        if "@" in model:
            model, backend = model.split("@", 1)
        for task_json in glob.glob(os.path.join(res_dir, "*.json")):
            task = os.path.splitext(os.path.basename(task_json))[0]
            with open(task_json) as f:
                data = json.load(f)
            test = data.get("test", data)
            if "cos_sim" in test:
                score = test["cos_sim"]["spearman"]
            else:
                score = test.get("main_score")
            out[(model, backend)][mode][task] = score
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.005,
                    help="flag |TPU-CPU| deltas above this")
    args = ap.parse_args()

    scores = load_scores()
    models = sorted({m for (m, b) in scores if b == "tpu"})
    if not models:
        print("no @tpu result dirs found — run the TPU quality sweep first")
        raise SystemExit(2)

    worst = 0.0
    flagged = []
    for model in models:
        cpu = scores.get((model, "cpu"), {})
        tpu = scores.get((model, "tpu"), {})
        tasks = sorted({t for m in tpu.values() for t in m})
        print(f"\n### {model} — TPU (bf16 + Pallas + f16 wire) vs CPU "
              "(f32 numerics)\n")
        print("| mode | " + " | ".join(
            f"{t} tpu | cpu | Δ" for t in tasks) + " |")
        print("|" + "---|" * (1 + 3 * len(tasks)))
        for mode in MODES:
            if mode not in tpu:
                continue
            cells = []
            for t in tasks:
                tv = tpu[mode].get(t)
                cv = cpu.get(mode, {}).get(t)
                if tv is None or cv is None:
                    cells += ["" if tv is None else f"{tv:.4f}",
                              "" if cv is None else f"{cv:.4f}", ""]
                    continue
                d = tv - cv
                worst = max(worst, abs(d))
                mark = " ⚠" if abs(d) > args.threshold else ""
                if abs(d) > args.threshold:
                    flagged.append((model, mode, t, d))
                cells += [f"{tv:.4f}", f"{cv:.4f}", f"{d:+.4f}{mark}"]
            print(f"| {mode} | " + " | ".join(cells) + " |")

    print(f"\nworst |Δ| = {worst:.4f} (threshold {args.threshold})")
    if flagged:
        print("exceeding threshold:")
        for model, mode, task, d in flagged:
            print(f"  {model} {mode} {task}: {d:+.4f}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()

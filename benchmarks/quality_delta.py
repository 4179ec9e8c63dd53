#!/usr/bin/env python
"""CPU↔TPU quality delta tables (VERDICT r4 #1).

Reads the committed offline quality results in benchmarks/results/ —
plain `<model>_<mode>` dirs are the forced-CPU f32-numerics tier,
`<model>@tpu_<mode>` dirs the production TPU tier (bf16 compute, Pallas
kernels, f16 wire) — and emits one markdown table per model with, for
each mode × task: the TPU score, the CPU score, and the delta. Flags any
|delta| above the threshold (default 0.005 = the reference parity
budget's 0.5-point resolution on these metrics).

Usage:
  python benchmarks/quality_delta.py [--threshold 0.005]
  python benchmarks/quality_delta.py --write-docs   # refresh docs/MTEB.md
Exit code 1 if any pair exceeds the threshold (usable as a gate).

With --write-docs the tables are spliced into docs/MTEB.md between the
`<!-- generated:quality-delta -->` markers, same anti-drift contract as
benchmarks/render_headline.py: the rendered copy is byte-identical to
this generator's output, so hand-edits inside the block are overwritten.
"""
import argparse
import glob
import os
import sys
from collections import defaultdict

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from results_common import (  # noqa: E402
    extract_score,
    splice_markers,
    split_model_mode,
)

RESULTS = os.path.join(HERE, "results")
MTEB_MD = os.path.join(os.path.dirname(HERE), "docs", "MTEB.md")

MODES = ("f32", "f16", "q4_0", "q4_1", "int8")

BEGIN = ("<!-- generated:quality-delta (benchmarks/quality_delta.py "
         "--write-docs — edit the results, not this block) -->")
END = "<!-- generated:quality-delta:end -->"


def load_scores():
    """{(model, backend): {mode: {task: score}}}"""
    out = defaultdict(lambda: defaultdict(dict))
    for res_dir in sorted(glob.glob(os.path.join(RESULTS, "*_*"))):
        split = split_model_mode(os.path.basename(res_dir), MODES)
        if split is None:
            continue
        model, mode = split
        backend = "cpu"
        if "@" in model:
            model, backend = model.split("@", 1)
        for task_json in glob.glob(os.path.join(res_dir, "*.json")):
            task = os.path.splitext(os.path.basename(task_json))[0]
            score, _ = extract_score(task_json)
            out[(model, backend)][mode][task] = score
    return out


def render(scores, threshold):
    """Returns (markdown lines, worst |delta|, flagged rows)."""
    models = sorted({m for (m, b) in scores if b == "tpu"})
    lines, worst, flagged = [], 0.0, []
    for model in models:
        cpu = scores.get((model, "cpu"), {})
        tpu = scores.get((model, "tpu"), {})
        tasks = sorted({t for m in tpu.values() for t in m})
        lines += [f"### {model} — TPU (bf16 + Pallas + f16 wire) vs CPU "
                  "(f32 numerics)", ""]
        lines.append("| mode | " + " | ".join(
            f"{t} tpu | cpu | Δ" for t in tasks) + " |")
        lines.append("|" + "---|" * (1 + 3 * len(tasks)))
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
                mark = " ⚠" if abs(d) > threshold else ""
                if abs(d) > threshold:
                    flagged.append((model, mode, t, d))
                cells += [f"{tv:.4f}", f"{cv:.4f}", f"{d:+.4f}{mark}"]
            lines.append(f"| {mode} | " + " | ".join(cells) + " |")
        lines.append("")
    return models, lines, worst, flagged


def write_docs(lines):
    splice_markers(MTEB_MD, BEGIN, END, "\n".join(lines))
    print(f"wrote {MTEB_MD}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.005,
                    help="flag |TPU-CPU| deltas above this")
    ap.add_argument("--write-docs", action="store_true",
                    help="splice the tables into docs/MTEB.md's "
                    "generated block")
    args = ap.parse_args()

    scores = load_scores()
    models, lines, worst, flagged = render(scores, args.threshold)
    if not models:
        print("no @tpu result dirs found — run the TPU quality sweep first")
        raise SystemExit(2)
    print("\n".join(lines))
    if args.write_docs:
        write_docs(lines)

    print(f"\nworst |Δ| = {worst:.4f} (threshold {args.threshold})")
    if flagged:
        print("exceeding threshold:")
        for model, mode, task, d in flagged:
            print(f"  {model} {mode} {task}: {d:+.4f}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()

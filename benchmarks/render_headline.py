#!/usr/bin/env python
"""Generate the README "Headline numbers" block and docs/PERF.md's
model-family table from the measurement artifacts (VERDICT r4 #2).

Three hand-maintained copies of the headline numbers had drifted ~7%
(README said 21,332/s and "~147k device-side"; BENCH_r04.json said
21,806.7 and 137,902.9). The reference generates its README tables from
results JSONs (benchmarks/print_tables.py); this script holds the repo to
the same standard: the numbers live in ONE committed artifact and every
rendered copy is byte-identical to this generator's output.

Sources, in precedence order (freshest row per metric wins, decided by
the per-row ``measured_at`` stamp):
  * the newest committed ``BENCH_r*.json`` (driver-captured runs);
  * with ``--merge-lkg``: the local last-known-good cache
    (~/.cache/bert_tpu/bench_lkg.json) — rows bench.py checkpointed
    since the last driver run.

The merged metric set is snapshotted to
``benchmarks/results/headline_metrics.json`` (committed), so
``--check --source benchmarks/results/headline_metrics.json`` is
reproducible on any checkout without this box's cache.

Usage:
  python benchmarks/render_headline.py                # rewrite both docs
  python benchmarks/render_headline.py --merge-lkg    # + local LKG rows
  python benchmarks/render_headline.py --check        # exit 1 on drift
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from results_common import splice_markers  # noqa: E402

SNAPSHOT = os.path.join(REPO, "benchmarks", "results",
                        "headline_metrics.json")
README = os.path.join(REPO, "README.md")
PERF = os.path.join(REPO, "docs", "PERF.md")

BEGIN = "<!-- generated:{tag} (benchmarks/render_headline.py — edit the sources, not this block) -->"  # noqa: E501
END = "<!-- generated:{tag}:end -->"

# display names + reference comparators per model family (BASELINE.md §6;
# bge-large has no reference row — bert-base's 81/s is the conservative
# comparator per VERDICT r2 #5, rendered as a footnote not a column value)
FAMILIES = [
    ("minilm_l6", "all-MiniLM-L6-v2 (6L/384d)", 506.0),
    ("minilm_l12", "all-MiniLM-L12-v2 (12L/384d)", 2758 / 11.27),
    ("bert_base", "bert-base-uncased (12L/768d)", 2758 / 33.93),
    ("bge_large", "bge-large class (24L/1024d/H16)", None),
]


def newest_bench() -> str:
    files = glob.glob(os.path.join(REPO, "BENCH_r*.json"))
    if not files:
        raise SystemExit("no BENCH_r*.json found")
    # numeric round order (lexical would put r10 before r2)
    def round_no(p):
        m = re.search(r"BENCH_r(\d+)", p)
        return int(m.group(1)) if m else -1

    return max(files, key=round_no)


def load_bench(path: str) -> dict:
    """BENCH_r*.json / headline_metrics.json → {metric: row}."""
    with open(path) as f:
        data = json.load(f)
    if "metrics" in data:  # our own snapshot format
        return data["metrics"]
    parsed = data.get("parsed", data)
    rows = [parsed] + list(parsed.get("extra_metrics", []))
    out = {}
    for row in rows:
        if "metric" in row and isinstance(row.get("value"), (int, float)):
            out[row["metric"]] = {k: v for k, v in row.items()
                                  if k not in ("metric", "extra_metrics")}
    return out


def merge_lkg(metrics: dict) -> dict:
    from bench import _load_lkg  # filtered + seed-backfilled

    for name, row in _load_lkg().items():
        cur = metrics.get(name)
        # LKG rows carry ISO stamps; BENCH rows too. String comparison is
        # correct for ISO-8601; seed rows ("BENCH_r02.json (...)") never
        # beat a real stamp.
        new_at = str(row.get("measured_at", ""))
        cur_at = str(cur.get("measured_at", "")) if cur else ""
        if cur is None or (new_at[:2] == "20" and new_at > cur_at):
            from bench import BASELINE_BY_METRIC
            base = BASELINE_BY_METRIC.get(name)
            merged = dict(row)
            if base:
                merged["vs_baseline"] = round(row["value"] / base, 2)
            metrics[name] = merged
    return metrics


def fmt(v: float) -> str:
    return f"{v:,.0f}"


def _get(metrics: dict, name: str):
    row = metrics.get(name)
    return row if row and isinstance(row.get("value"), (int, float)) \
        and row["value"] > 0 else None


def render_readme_block(metrics: dict, source: str) -> str:
    """The README headline paragraph, every number from `metrics`."""
    def v(name):
        row = _get(metrics, name)
        return row["value"] if row else None

    head = v("sentences_per_sec_minilm_l6_q4_0")
    if head is None:
        raise SystemExit("headline metric missing from the source artifact")
    head_x = metrics["sentences_per_sec_minilm_l6_q4_0"]["vs_baseline"]
    int8 = v("sentences_per_sec_minilm_l6_q4_0_int8wire")
    dev = v("device_side_sentences_per_sec_minilm_l6_q4_0")
    dev_x = (_get(metrics, "device_side_sentences_per_sec_minilm_l6_q4_0")
             or {}).get("vs_baseline")
    l12 = v("sentences_per_sec_minilm_l12_q4_0")
    base = v("sentences_per_sec_bert_base_q4_0")
    base_x = (_get(metrics, "sentences_per_sec_bert_base_q4_0")
              or {}).get("vs_baseline")
    bge = v("sentences_per_sec_bge_large_q4_0")
    bge_dev = v("device_side_sentences_per_sec_bge_large_q4_0")
    stream = v("streaming_sentences_per_sec_minilm_l6_q4_0")

    src = os.path.relpath(source, REPO)
    lines = [
        f"**Headline numbers** (v5e-1; generated from `{src}` by "
        "`benchmarks/render_headline.py` — regenerate, don't hand-edit):",
        "",
        f"**{fmt(head)} sentences/s** end-to-end on all-MiniLM-L6-v2 Q4_0 "
        f"— **{head_x:.0f}×** the reference CPU baseline (506 sentences/s, "
        "BASELINE.md) — on a dev box where device→host transfer dominates"
        + (f" ({fmt(int8)}/s with the int8 wire)" if int8 else "")
        + "; device-side the same model encodes "
        + (f"**{fmt(dev)} sentences/s/chip** ({dev_x:.0f}× per chip)."
           if dev else "(device-side rate not captured this sweep).")]
    sweep_bits = []
    if l12:
        sweep_bits.append(f"L12 {fmt(l12)}/s")
    if base:
        sweep_bits.append(f"bert-base {fmt(base)}/s"
                          + (f" ({base_x:.0f}× its 81/s reference row)"
                             if base_x else ""))
    if bge:
        sweep_bits.append(
            f"bge-large {fmt(bge)}/s e2e"
            + (f" vs {fmt(bge_dev)}/s device-side" if bge_dev else ""))
    if sweep_bits:
        lines.append("Full sweep: " + ", ".join(sweep_bits) + ".")
    if stream:
        lines.append(f"Streaming bulk indexing (`encode_iter`, "
                     f"O(depth × window) memory — ~25 MB at the defaults): "
                     f"{fmt(stream)}/s.")
    lines.append("Kernel-level accounting and floors in "
                 "[docs/PERF.md](docs/PERF.md); request-path internals in "
                 "[docs/INTERNALS.md](docs/INTERNALS.md).")
    stale = sorted(n for n, r in metrics.items() if r.get("stale"))
    if stale:
        lines.append("")
        lines.append("*Carried (not re-measured in this artifact): "
                     + ", ".join(f"`{s}`" for s in stale) + ".*")
    return "\n".join(lines)


def render_perf_table(metrics: dict, source: str) -> str:
    from bench import DEVICE_ROWS

    src = os.path.relpath(source, REPO)
    out = [
        f"Generated from `{src}` by `benchmarks/render_headline.py` "
        "(regenerate, don't hand-edit). Device step = rows/rate of the "
        "slope-timed device-side measurement at (rows, 16) batches "
        "(bench.py DEVICE_ROWS; bge-large uses 128-row blocks — a 512-row "
        "24L scan step would run ~9 s).",
        "",
        "| model | device step | device-side sentences/s | e2e on this box "
        "(d2h-bound) | reference CPU q4_0 (BASELINE.md) | device ratio |",
        "|---|---|---|---|---|---|",
    ]
    for key, label, ref in FAMILIES:
        dev = _get(metrics, f"device_side_sentences_per_sec_{key}_q4_0")
        e2e = _get(metrics, f"sentences_per_sec_{key}_q4_0")
        rows = DEVICE_ROWS[key]
        if dev:
            step = f"{rows / dev['value'] * 1e3:.2f} ms ({rows},16)"
            dev_s = fmt(dev["value"]) + (" (carried)"
                                         if dev.get("stale") else "")
            ratio = f"~{dev['value'] / ref:.0f}×" if ref else "—"
        else:
            step, dev_s, ratio = "—", "not captured", "—"
        e2e_s = (fmt(e2e["value"]) + "/s"
                 + (" (carried)" if e2e.get("stale") else "")) \
            if e2e else "not captured"
        ref_s = f"~{ref:.0f}/s" if ref else "n/a (no reference entry)"
        out.append(f"| {label} | {step} | {dev_s} | {e2e_s} | {ref_s} "
                   f"| {ratio} |")
    return "\n".join(out)


def format_sweep_table(records) -> str:
    """Markdown table for a latency_sweep.py record list — the ONE
    formatter for both the sweep's stdout and the generated PERF.md
    blocks (same drift rule as the headline numbers)."""
    out = ["| window | load | sent/s | text p50 | p95 | p99 | "
           "frame p99 | server p99 |",
           "|---|---|---|---|---|---|---|---|"]
    for r in records:
        lt = r["latency_text"] or {"p50_ms": "—", "p95_ms": "—",
                                   "p99_ms": "—"}
        lf = r["latency_batch_frame"]
        slat = r["server_latency_us"]  # None against a pre-STATS2 server
        sp99 = f"{slat['p99'] / 1e3:.1f} ms" if slat else "—"
        fp99 = f"{lf['p99_ms']} ms" if lf else "—"
        wlabel = (r["window_ms"] if isinstance(r["window_ms"], str)
                  else f"{r['window_ms']} ms")
        out.append(f"| {wlabel} | {r['load']} "
                   f"| {r['sentences_per_sec']} "
                   f"| {lt['p50_ms']} ms | {lt['p95_ms']} ms "
                   f"| {lt['p99_ms']} ms | {fp99} | {sp99} |")
    return "\n".join(out)


def render_latency_block(path: str) -> str:
    """PERF.md block for one committed latency-sweep artifact."""
    with open(path) as f:
        data = json.load(f)
    src = os.path.relpath(path, REPO)
    head = (f"Generated from `{src}` by `benchmarks/render_headline.py` "
            f"({data['seconds']} s per point, max_batch "
            f"{data['max_batch']}; regenerate, don't hand-edit).")
    return head + "\n\n" + format_sweep_table(data["records"])


# (tag, PERF.md block source) for the committed sweep artifacts; a
# missing file skips its block so a checkout without one sweep still
# renders the rest
LATENCY_SWEEPS = [
    ("latency-cpu", os.path.join(REPO, "benchmarks", "results",
                                 "latency_sweep_cpu.json")),
    ("latency-tpu", os.path.join(REPO, "benchmarks", "results",
                                 "latency_sweep_tpu.json")),
]


def splice(path: str, tag: str, body: str) -> bool:
    """Replace the marker-delimited block in `path`. Returns True if the
    file content changed."""
    return splice_markers(path, BEGIN.format(tag=tag), END.format(tag=tag),
                          body)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", help="metrics artifact (default: newest "
                    "BENCH_r*.json)")
    ap.add_argument("--merge-lkg", action="store_true",
                    help="overlay fresher rows from the local LKG cache")
    ap.add_argument("--check", action="store_true",
                    help="verify docs match the generator; exit 1 on drift")
    args = ap.parse_args()

    source = args.source or newest_bench()
    metrics = load_bench(source)
    label = source
    if args.merge_lkg:
        metrics = merge_lkg(metrics)
        label = f"{source} + LKG cache"

    if args.check:
        # check against the committed snapshot, never the local cache
        with open(SNAPSHOT) as f:
            snap = json.load(f)
        metrics, label = snap["metrics"], snap["source"]
    else:
        with open(SNAPSHOT, "w") as f:
            json.dump({"source": os.path.relpath(label, REPO)
                       if os.path.isabs(label) else label,
                       "metrics": metrics}, f, indent=1, sort_keys=True)
            f.write("\n")

    readme_block = render_readme_block(metrics, SNAPSHOT)
    perf_block = render_perf_table(metrics, SNAPSHOT)
    blocks = [(README, "headline", readme_block),
              (PERF, "model-table", perf_block)]
    blocks += [(PERF, tag, render_latency_block(p))
               for tag, p in LATENCY_SWEEPS if os.path.exists(p)]

    if args.check:
        drift = []
        for path, tag, body in blocks:
            begin, end = BEGIN.format(tag=tag), END.format(tag=tag)
            with open(path, encoding="utf-8") as f:
                text = f.read()
            m = re.search(re.escape(begin) + r"\n(.*?)\n" + re.escape(end),
                          text, re.DOTALL)
            if not m or m.group(1) != body:
                drift.append(path)
        if drift:
            print("DRIFT: " + ", ".join(drift)
                  + " — run benchmarks/render_headline.py")
            raise SystemExit(1)
        print("headline blocks match the generator")
        return

    changed = [p for p, t, b in blocks if splice(p, t, b)]
    print(f"source: {label}")
    print("rewrote: " + (", ".join(changed) if changed else "(no changes)"))


if __name__ == "__main__":
    main()

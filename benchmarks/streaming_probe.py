#!/usr/bin/env python
"""Streaming-gap accounting (VERDICT r4 #3): why does `encode_iter` run
below the bulk `encode_batch` rate, and which (window, depth) closes it?

BENCH_r04 measured streaming at 11.1k sentences/s vs 21.8k bulk on the
tunnel-attached dev box with window=2048 and the old fixed depth of 2.
This probe sweeps window x pipeline depth over the same synthetic STSB
corpus bench.py uses, prints per-configuration rates plus the engine's
phase accounting (tokenize / dispatch / gather — the remainder of wall
time is spent blocked on device compute + d2h), and a bulk reference
point measured with the SAME engine. Output: one JSON line per config +
a markdown table, written to benchmarks/results/streaming_probe.json.

Usage (real chip):
    python benchmarks/streaming_probe.py [--windows 1024 2048 4096]
                                         [--depths 2 3 4] [--n 11032]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

if os.environ.get("JAX_PLATFORMS", "").lower().split(",")[0].strip() == "cpu":
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"].lower())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/tmp/bench_minilm_l6_q4_0.bin")
    ap.add_argument("--windows", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    ap.add_argument("--depths", type=int, nargs="+", default=[2, 3, 4])
    ap.add_argument("-n", type=int, default=11032,
                    help="corpus size (default: 4x the STSB test split, "
                    "matching bench.py's streaming stage)")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        REPO, "benchmarks", "results", "streaming_probe.json"))
    args = ap.parse_args()

    from bench import build_model_file, synth_sentences

    from bert_tpu import BertTPU

    if not os.path.exists(args.model):
        build_model_file(args.model, "minilm_l6")
    model = BertTPU.from_file(args.model, max_batch=2048)
    sentences = synth_sentences(2758) * ((args.n + 2757) // 2758)
    sentences = sentences[: args.n]

    # warm every shape both paths hit
    model.encode_batch(sentences[:2758])
    list(model.encode_iter(sentences, window=max(args.windows)))

    records = []

    def run(label, fn):
        best, phases = 0.0, None
        for _ in range(args.trials):
            model.timers.reset()
            t0 = time.time()
            n_done = fn()
            dt = time.time() - t0
            assert n_done == args.n
            if args.n / dt > best:
                best = args.n / dt
                phases = {k: v["total_s"] for k, v in
                          model.timers.summary()["phases"].items()}
                phases["wall"] = round(dt, 3)
                # host time not in a phase ≈ blocked on device/d2h
                phases["blocked"] = round(
                    dt - sum(v for k, v in phases.items() if k != "wall"), 3)
        rec = {"config": label, "sentences_per_sec": round(best, 1),
               "host_phases_s": phases}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    run("bulk", lambda: len(model.encode_batch(sentences)))
    for window in args.windows:
        for depth in args.depths:
            run(f"window={window} depth={depth}",
                (lambda w=window, d=depth: sum(
                    len(b) for b in model.encode_iter(sentences, window=w,
                                                      depth=d))))

    bulk = records[0]["sentences_per_sec"]
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"n_sentences": args.n, "trials": args.trials,
                   "records": records}, f, indent=1)
    print("\n| config | sentences/s | % of bulk | host phases (s) |")
    print("|---|---|---|---|")
    for r in records:
        print(f"| {r['config']} | {r['sentences_per_sec']:,.0f} "
              f"| {r['sentences_per_sec'] / bulk * 100:.0f}% "
              f"| {r['host_phases_s']} |")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()

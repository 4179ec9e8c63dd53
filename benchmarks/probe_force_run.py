"""Exercise the REAL Mosaic probe path end-to-end (no monkeypatching).

VERDICT r3 #7: the probe system's production path — probe-compile every
shape on an unmeasured toolchain — had only ever run under test
monkeypatches. This script runs it for real on a TPU session:

  * forces probing (``BERT_TPU_MOSAIC_PROBE=force``) so even
    measured-toolchain table-True shapes are re-verified by an actual
    child-process Mosaic compile;
  * points the verdict cache at a scratch directory so a fresh cache is
    populated from nothing (the canary pays its one-time cost too);
  * times every child-process probe (wall seconds per verdict);
  * compares every probed verdict against the static measured table
    (``ops/fused_attention.fused_attn_table``) and reports routing drift.

Shape set: the attention configs the engine actually routes for the three
production model families (MiniLM D=384/H12/dh32, bert-base D=768/H12/dh64,
bge-large D=1024/H16/dh64) at the serving buckets, in the bf16 compute
dtype, plus the pairwise (packed-bias) variants which always probe.

Run (healthy tunnel required):

    python benchmarks/probe_force_run.py [--out results/probe_force.json]

Reference anchor: bert.cpp has no runtime compile-envelope problem (ggml
kernels are ISA-dispatched at build time); this subsystem is the TPU-native
answer to the same portability question, so its production path needs the
same level of proof the reference gets from simply building.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (seq, n_head, d_head) per family x bucket; bf16 is the compute dtype.
FAMILIES = {
    "minilm": (12, 32),
    "bert-base": (12, 64),
    "bge-large": (16, 64),
}
BUCKETS = (64, 128, 256, 512)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write the JSON report here as well as stdout")
    ap.add_argument("--families", default="minilm,bert-base,bge-large")
    ap.add_argument("--skip-pairwise", action="store_true")
    args = ap.parse_args()

    fams = [f.strip() for f in args.families.split(",") if f.strip()]
    unknown = sorted(set(fams) - set(FAMILIES))
    if unknown:
        ap.error(f"unknown families {unknown}; have {sorted(FAMILIES)}")

    # Env must be decided before bert_tpu/jax imports. Force mode is the
    # script's whole purpose — a pre-exported BERT_TPU_MOSAIC_PROBE=1 must
    # not silently turn the run into table short-circuits (review r4).
    os.environ["BERT_TPU_MOSAIC_PROBE"] = "force"
    scratch = os.environ.get("BERT_TPU_CACHE_DIR")
    if not scratch:
        scratch = tempfile.mkdtemp(prefix="bert_tpu_probe_scratch_")
        os.environ["BERT_TPU_CACHE_DIR"] = scratch

    import jax

    # On this box the axon TPU plugin ignores the JAX_PLATFORMS env var —
    # only the config knob actually selects the backend (a CPU-forced
    # subprocess otherwise hangs in the tunnel retry loop).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    from bert_tpu.ops import mosaic_probe as mp
    from bert_tpu.ops.fused_attention import fused_attn_table

    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "requires a TPU backend",
                          "backend": jax.default_backend()}))
        return 1

    # Time every child-process compile without changing its behavior.
    probe_times = []
    orig_run_probe = mp._run_probe

    def timed_run_probe(seq, n_head, d_head, dtype_name, pairwise):
        t0 = time.time()
        verdict = orig_run_probe(seq, n_head, d_head, dtype_name, pairwise)
        probe_times.append({
            "shape": [seq, n_head, d_head, dtype_name, bool(pairwise)],
            "wall_s": round(time.time() - t0, 2),
            "verdict": verdict,
        })
        return verdict

    mp._run_probe = timed_run_probe

    rows = []
    drift = []
    for fam in fams:
        n_head, d_head = FAMILIES[fam]
        for seq in BUCKETS:
            for pairwise in ((False,) if args.skip_pairwise
                             else (False, True)):
                table = bool(fused_attn_table(seq, n_head, d_head,
                                              jnp.bfloat16))
                t0 = time.time()
                ok = mp.fused_attn_ok(seq, n_head, d_head, jnp.bfloat16,
                                      pairwise=pairwise,
                                      table_fn=fused_attn_table)
                row = {"family": fam, "seq": seq, "n_head": n_head,
                       "d_head": d_head, "pairwise": pairwise,
                       "table": table, "probed": bool(ok),
                       "wall_s": round(time.time() - t0, 2)}
                rows.append(row)
                # Drift only counts where the table is evidence: the table
                # never measured pairwise bias shapes (strictly larger
                # working set), so those can't "drift" from it.
                if not pairwise and bool(ok) != table:
                    drift.append(row)
                print(f"[probe_force] {fam} T={seq} pairwise={int(pairwise)}"
                      f" table={table} probed={ok}"
                      f" ({row['wall_s']:.1f}s)", flush=True)

    cache = mp._load_disk_cache()
    times = [p["wall_s"] for p in probe_times]
    report = {
        "toolchain": mp.toolchain_key(),
        "probe_mode": mp.probe_mode(),
        "cache_dir": scratch,
        "cached_verdicts": len(cache),
        "child_probes_run": len(probe_times),
        "probe_wall_s": {
            "min": min(times) if times else None,
            "max": max(times) if times else None,
            "mean": round(sum(times) / len(times), 2) if times else None,
            "total": round(sum(times), 1),
        },
        "routing_drift_vs_table": drift,
        "rows": rows,
        "probes": probe_times,
    }
    if not probe_times:
        # cached verdicts in a pre-populated BERT_TPU_CACHE_DIR can satisfy
        # every shape with zero child compiles — that is NOT a force-probe
        # exercise, fail loudly instead of printing a vacuous report
        report["error"] = ("no child probes ran (pre-populated cache dir? "
                           "point BERT_TPU_CACHE_DIR at a scratch dir)")
    print(json.dumps(report, indent=1))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=1)
    return 0 if probe_times else 1


if __name__ == "__main__":
    raise SystemExit(main())

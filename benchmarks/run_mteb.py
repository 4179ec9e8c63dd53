#!/usr/bin/env python
"""MTEB quality/performance harness — the reference's end-to-end validation
protocol (benchmarks/run_mteb.py: STSBenchmark + EmotionClassification per
dtype, plus sentence-transformers baselines), pointed at the TPU engine.

Requires the ``mteb`` package and dataset downloads — both unavailable in a
zero-egress sandbox, so this script degrades to a clear error; run it on a
connected machine. Score extraction/printing matches print_tables.py.

Usage:
  python benchmarks/run_mteb.py -m models/all-MiniLM-L6-v2 \
      [--modes q4_0 q4_1 f32 f16 sbert] [--tasks STSBenchmark EmotionClassification]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TASKS = ["STSBenchmark", "EmotionClassification"]
MODES = ["q4_0", "q4_1", "f32", "f16"]


class TpuEngineForMTEB:
    """MTEB model adapter: encode(list[str], **kw) -> np.ndarray."""

    def __init__(self, model_path: str, mode: str, pooling=None):
        import jax.numpy as jnp

        from bert_tpu import BertTPU
        from bert_tpu.quant import FTYPE_BY_NAME

        # f32/f16 differ by compute dtype (weights stay dense); q4_* by
        # weight quantization — so the four modes measure four distinct
        # configurations, mirroring the reference's four file dtypes.
        # pooling=None → auto (HF dirs declare it; ggml bins default mean)
        compute = jnp.float32 if mode == "f32" else None  # None → bf16 on TPU
        if os.path.isdir(model_path):
            qft = FTYPE_BY_NAME[mode] if mode in ("q4_0", "q4_1") else None
            self.model = BertTPU.from_file(model_path, quantize_ftype=qft,
                                           compute_dtype=compute,
                                           pooling=pooling)
        else:
            # a .bin path: substitute the dtype suffix if per-mode files
            # exist (ggml naming: ggml-model-<dtype>.bin), else load as-is
            candidate = None
            for known in ("f32", "f16", "q4_0", "q4_1"):
                if f"-{known}.bin" in model_path:
                    candidate = model_path.replace(f"-{known}.bin",
                                                   f"-{mode}.bin")
                    break
            path = (candidate if candidate and os.path.exists(candidate)
                    else model_path)
            self.model = BertTPU.from_file(path, compute_dtype=compute,
                                           pooling=pooling)

    def encode(self, sentences, **kwargs):
        return self.model.encode_batch(list(sentences))


def run(args) -> None:
    try:
        import mteb
    except ImportError:
        sys.exit("the `mteb` package is not installed (zero-egress sandbox?) "
                 "— install mteb and run on a connected machine")

    out_root = getattr(args, "out_root", None) or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results")
    for mode in args.modes:
        if mode.startswith("sbert"):
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(args.sbert_name, device="cpu")
        else:
            model = TpuEngineForMTEB(args.model, mode,
                                     pooling=getattr(args, "pooling", None))
        if mode == "f16":
            # reference MODE LABEL; on TPU the compute dtype is bfloat16
            # (there is no f16 compute path) — see eval_common.make_engine
            print("[f16] note: compute dtype on TPU is bfloat16")
        pooling = getattr(args, "pooling", None)
        # pooling-suffixed like eval_common.result_dir: a cls re-run must
        # not clobber the mean results (overwrite_results=True below)
        suffix = f"-{pooling}" if pooling and pooling != "mean" else ""
        out_dir = os.path.join(
            out_root,
            f"{os.path.basename(os.path.normpath(args.model))}{suffix}"
            f"_{mode}",
        )
        tasks = mteb.get_tasks(tasks=args.tasks)
        evaluation = mteb.MTEB(tasks=tasks)
        evaluation.run(model, output_folder=out_dir,
                       eval_splits=["test"], overwrite_results=True)
        print(f"[{mode}] results in {out_dir}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True,
                    help="HF checkpoint dir (quantized per mode) or .bin")
    ap.add_argument("--modes", nargs="+", default=MODES)
    ap.add_argument("--tasks", nargs="+", default=TASKS)
    ap.add_argument("--sbert-name",
                    default="sentence-transformers/all-MiniLM-L6-v2")
    ap.add_argument("--pooling", choices=["mean", "cls"], default=None,
                    help="override pooling for ggml bins (HF dirs "
                    "auto-detect from 1_Pooling/config.json)")
    ap.add_argument("--out-root", default=None,
                    help="results root (default: benchmarks/results)")
    run(ap.parse_args())


if __name__ == "__main__":
    main()

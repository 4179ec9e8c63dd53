"""CLI: load → tokenize → embed one prompt, with timings.

The counterpart of the reference's demo CLI and parameter parser
(examples/main.cpp, bert_params/bert_params_parse bert.cpp:136-193): prints
the token ids, token strings, the embedding vector and load/eval wall
times. Flags mirror the reference surface: ``-m/--model``, ``-p/--prompt``,
``--port``, ``-t/--threads`` (accepted for drop-in compatibility; host
thread count is irrelevant to the TPU compute path — noted at runtime).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def add_common_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("-m", "--model", required=True,
                    help="path to a ggml-bin model file or HF checkpoint dir")
    ap.add_argument("-t", "--threads", type=int, default=6,
                    help="(compat) CPU threads; ignored — compute runs on TPU")
    ap.add_argument("--port", type=int, default=8085,
                    help="server port (server mode only)")
    ap.add_argument("--quantize", choices=["q4_0", "q4_1"], default=None,
                    help="quantize on load (HF checkpoints only)")
    ap.add_argument("--dtype", choices=["bf16", "f32"], default=None,
                    help="activation compute dtype (default: bf16 on TPU)")
    ap.add_argument("--dp", type=int, default=None,
                    help="data-parallel degree (batch rows sharded over the "
                    "mesh's data axis; default 1)")
    ap.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel degree (Megatron weight sharding "
                    "over ICI-adjacent chips; default 1)")
    ap.add_argument("--pooling", choices=["mean", "cls"], default=None,
                    help="sentence pooling: mean (sentence-transformers "
                    "models, the reference's hardcoded choice) or cls "
                    "(BGE-family checkpoints). Default: what the "
                    "checkpoint declares (HF dirs), else mean")


def load_model_from_args(args, max_batch=None):
    import os

    platforms = os.environ.get("JAX_PLATFORMS", "").lower()
    if platforms.split(",")[0].strip() == "cpu":
        # the env var alone does NOT override an installed TPU plugin
        # (e.g. axon on PYTHONPATH): a user/test asking for cpu would
        # silently run on the TPU. Honor the request explicitly —
        # case-insensitively, and for priority lists ("cpu,tpu") too,
        # keeping the full list so later platforms stay available.
        import jax

        jax.config.update("jax_platforms", platforms)

    import jax.numpy as jnp

    from .engine import BertTPU
    from .quant import FTYPE_BY_NAME

    qft = FTYPE_BY_NAME[args.quantize] if args.quantize else None
    dtype = {None: None, "bf16": jnp.bfloat16, "f32": jnp.float32}[args.dtype]
    kw = {}
    if getattr(args, "dp", None) or getattr(args, "tp", None):
        kw = {"dp": args.dp, "tp": args.tp}
    if getattr(args, "pooling", None):
        kw["pooling"] = args.pooling
    if max_batch is not None:
        # the server must size the ENGINE's bucket planner to its
        # scheduler cap — otherwise a --max-batch above the engine default
        # warms shapes the dispatcher can never emit while the real ones
        # stay cold (review r4). Rounded up to a dp multiple (engine
        # invariant); the engine chunks internally so a slightly larger
        # cap than the scheduler's is harmless.
        dp = getattr(args, "dp", None) or 1
        kw["max_batch"] = -(-max_batch // dp) * dp
    return BertTPU.from_file(args.model, quantize_ftype=qft,
                             compute_dtype=dtype, **kw)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        "bert_tpu.cli", description="embed one prompt and print it")
    add_common_args(ap)
    ap.add_argument("-p", "--prompt", default="Hello world",
                    help="prompt to embed")
    args = ap.parse_args(argv)

    t_start = time.perf_counter_ns()
    model = load_model_from_args(args)
    t_load = time.perf_counter_ns()

    tokens = model.tokenize(args.prompt)
    print(f"{len(tokens)} tokens:")
    print(tokens)
    print([model.id_to_token(t) for t in tokens])

    t_tok = time.perf_counter_ns()
    emb = model.encode(args.prompt)  # includes first-bucket compile
    t_first = time.perf_counter_ns()
    emb = model.encode(args.prompt)
    t_eval = time.perf_counter_ns()

    np.set_printoptions(precision=6, suppress=True, threshold=24,
                        edgeitems=8)
    print(f"embedding ({model.n_embd}):")
    print(np.asarray(emb))

    us = 1000
    print(f"\nload time   = {(t_load - t_start) / us / 1000:10.2f} ms")
    print(f"tokenize    = {(t_tok - t_load) / us / 1000:10.2f} ms")
    print(f"first eval  = {(t_first - t_tok) / us / 1000:10.2f} ms "
          f"(includes XLA compile)")
    print(f"eval time   = {(t_eval - t_first) / us / 1000:10.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end contrastive fine-tuning demo: TSV pairs → InfoNCE steps →
a weight cache any `BertTPU.from_file` consumer can serve.

The reference is inference-only; this surface is bert_tpu-native
(bert_tpu/train.py: jitted InfoNCE step, per-layer remat, optional GSPMD
DP×TP sharding). The demo trains on similarity-labeled pairs — rows of a
``sentence1<TAB>sentence2<TAB>score`` file at or above ``--min-score``
become positive pairs; in-batch others are the InfoNCE negatives.

Usage:
  python examples/finetune_contrastive.py -m model-f32.bin \
      [pairs.tsv] [--steps 100] [--batch 32] [--seq 64] [--lr 2e-5] \
      [--out tuned.npz] [--ckpt DIR] [--dp N --tp N]

Training needs DENSE weights (f32/f16 ggml, HF dir, or .npz cache) —
INT4-quantized parameters are not differentiable; quantize AFTER
fine-tuning (tools/quantize.py on the converted result).
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))


def pad_batch(token_lists, seq):
    ids = np.zeros((len(token_lists), seq), np.int32)
    mask = np.zeros((len(token_lists), seq), np.float32)
    for i, t in enumerate(token_lists):
        t = t[:seq]
        ids[i, : len(t)] = t
        mask[i, : len(t)] = 1.0
    return ids, mask


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True,
                    help="dense model: f32/f16 ggml-bin, HF dir, .npz cache")
    ap.add_argument("pairs", nargs="?",
                    default=os.path.join(REPO, "benchmarks", "data",
                                         "sts_en.tsv"))
    ap.add_argument("--min-score", type=float, default=3.5,
                    help="pairs scoring >= this are positives (STSB 0-5)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--temperature", type=float, default=0.05)
    ap.add_argument("--out", default="tuned.npz",
                    help=".npz weight cache loadable by BertTPU.from_file")
    ap.add_argument("--ckpt", default=None,
                    help="orbax train-state dir (resume with --ckpt later)")
    ap.add_argument("--dp", type=int, default=0)
    ap.add_argument("--tp", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from bert_tpu import BertTPU
    from bert_tpu.checkpoint import (load_train_state, save_params,
                                     save_train_state)
    from bert_tpu.quant import QuantTensor
    from bert_tpu.train import (init_train_state, make_optimizer,
                                make_sharded_train_step, make_train_step)
    from eval_common import read_sts_pairs

    engine = BertTPU.from_file(args.model, max_batch=args.batch)
    if any(isinstance(leaf, QuantTensor)
           for leaf in jax.tree_util.tree_leaves(
               engine.params, is_leaf=lambda x: isinstance(x, QuantTensor))):
        sys.exit("model has INT4-quantized weights — fine-tune the dense "
                 "f32/f16 file and quantize the result instead")

    s1, s2, gold = read_sts_pairs(args.pairs)
    keep = [i for i, g in enumerate(gold) if g >= args.min_score]
    if len(keep) < 2:
        sys.exit(f"only {len(keep)} pairs score >= {args.min_score}")
    print(f"{len(keep)} positive pairs (of {len(gold)}) from {args.pairs}")
    tok = lambda texts: [engine.tokenizer.tokenize(t, args.seq)
                         for t in texts]
    toks_a, toks_b = tok([s1[i] for i in keep]), tok([s2[i] for i in keep])

    opt = make_optimizer(args.lr)
    state = init_train_state(engine.params, opt)
    if args.ckpt and os.path.isdir(args.ckpt):
        state = load_train_state(args.ckpt, state)
        print(f"resumed from {args.ckpt} at step {int(state.step)}")
    if args.dp or args.tp:
        from bert_tpu.parallel.mesh import make_mesh

        dp, tp = max(1, args.dp), max(1, args.tp)
        mesh = make_mesh(dp * tp, tp=tp)
        state, step_fn = make_sharded_train_step(
            mesh, engine.config, opt, state, temperature=args.temperature,
            pooling=engine.pooling)
        print(f"sharded step over mesh (data={dp}, model={tp})")
    else:
        step_fn = make_train_step(engine.config, opt,
                                  temperature=args.temperature,
                                  pooling=engine.pooling)

    rng = np.random.default_rng(0)
    n = len(keep)
    first_loss = last_loss = None
    t0 = time.time()
    for it in range(args.steps):
        pick = rng.choice(n, size=min(args.batch, n), replace=False)
        batch = {}
        for side, toks in (("a", toks_a), ("b", toks_b)):
            ids, mask = pad_batch([toks[i] for i in pick], args.seq)
            batch[f"ids_{side}"], batch[f"mask_{side}"] = ids, mask
        state, metrics = step_fn(state, batch)
        loss = float(metrics["loss"])
        if first_loss is None:
            first_loss = loss
        last_loss = loss
        if it % max(1, args.steps // 10) == 0 or it == args.steps - 1:
            print(f"step {int(state.step):4d}  loss {loss:.4f}  "
                  f"grad_norm {float(metrics['grad_norm']):.3f}")
    dt = time.time() - t0
    print(f"{args.steps} steps in {dt:.1f}s "
          f"({args.steps * len(pick) / dt:.0f} pairs/s); "
          f"loss {first_loss:.4f} → {last_loss:.4f}")

    if args.ckpt:
        save_train_state(args.ckpt, state)
        print(f"train state → {args.ckpt}")
    host_params = jax.tree_util.tree_map(np.asarray, state.params)
    save_params(args.out, host_params, engine.config, engine.vocab.tokens,
                pooling=engine.pooling)
    print(f"weights → {args.out}  "
          f"(serve with BertTPU.from_file({args.out!r}))")
    return {"first_loss": first_loss, "last_loss": last_loss,
            "out": args.out}


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Regenerate the committed golden-embedding fixtures (tests/goldens/).

The goldens pin model numerics ACROSS ROUNDS: the fixture model (seeded
random weights, MiniLM-L6 shape) embedded at f32 / q4_0 / q4_1 / bf16 on
the CPU backend. tests/test_goldens.py asserts today's code still produces
these vectors — a deliberate numerics change (kernel rewrite, scale dtype,
accumulation order) must regenerate them CONSCIOUSLY by running:

    python tests/make_goldens.py

and committing the diff. This is the offline stand-in for the reference's
stored MTEB result JSONs (/root/reference/benchmarks/results/) until a
network-connected run can pin real-checkpoint scores (docs/MTEB.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")

SENTENCES = [
    "I'm going to the store",
    "so don't go anywhere",
    "Québec is nice",
    "hello, world!",
    "the store don't go going to the store store store",
    "go",
]

CFG_KW = dict(n_vocab=30522, n_max_tokens=512, n_embd=384,
              n_intermediate=1536, n_head=12, n_layer=6)
SEED = 42
PAD_T = 16  # all golden sentences fit; fixed shape keeps numerics stable


def compute_goldens():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from bert_tpu.model import bert_forward
    from bert_tpu.params import (
        BertConfig,
        params_from_named_tensors,
        random_named_tensors,
    )
    from bert_tpu.tokenizer import WordPieceTokenizer
    from fixture_vocab import build_fixture_vocab

    cfg = BertConfig(**CFG_KW)
    tok = WordPieceTokenizer(build_fixture_vocab())
    lists = [tok.tokenize(s, cfg.n_max_tokens) for s in SENTENCES]
    ids = np.zeros((len(lists), PAD_T), np.int32)
    mask = np.zeros((len(lists), PAD_T), np.float32)
    for i, t in enumerate(lists):
        ids[i, : len(t)] = t
        mask[i, : len(t)] = 1.0
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    named = random_named_tensors(cfg, seed=SEED)
    out = {"token_ids": np.asarray(ids)}
    params_by_ftype = {}  # f32 and bf16 share the SAME dense params
    for variant, (ftype, dtype) in {
        "f32": (None, jnp.float32),
        "q4_0": (2, jnp.float32),
        "q4_1": (3, jnp.float32),
        "bf16": (None, jnp.bfloat16),
    }.items():
        if ftype not in params_by_ftype:
            params_by_ftype[ftype] = params_from_named_tensors(
                named, cfg, quantize_ftype=ftype)
        params = params_by_ftype[ftype]
        emb = bert_forward(params, ids, mask, cfg, compute_dtype=dtype,
                           use_pallas=False)
        out[variant] = np.asarray(emb, np.float32)
    return out


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, "fixture_embeddings.npz")
    np.savez_compressed(path, **compute_goldens())
    print(f"wrote {path}")
    with np.load(path) as z:
        for k in z.files:
            print(f"  {k}: {z[k].shape}")


if __name__ == "__main__":
    main()

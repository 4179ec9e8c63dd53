"""Shared plumbing for the offline quality protocol (VERDICT r2 #2).

The reference validates quality with MTEB on real checkpoints
(/root/reference/benchmarks/run_mteb.py:22-25: STSBenchmark +
EmotionClassification). In a zero-egress sandbox neither real weights nor
the datasets exist, so the offline tiers substitute:

  * original, human-written, labeled ENGLISH datasets committed under
    benchmarks/data/ (sts_en.tsv: graded 0-5 sentence pairs following the
    STSB annotation scale; emotion_en.tsv: 6-class first-person emotion
    sentences matching the MTEB task's label space);
  * a deterministic **eval vocabulary built from the dataset itself**
    (every word the data contains gets a stable id; the reference golden
    ids for specials/letters are preserved), so real-English text
    tokenizes with full coverage instead of degenerating to the fixture
    vocab's golden-word subset;
  * shape-identical random-weight models quantized through the full
    ggml-bin path — quality numbers pin the f32↔q4_0↔q4_1↔int8 DELTAS
    (the thing quantization can regress), not absolute task scores.

Engines for every mode are built through :func:`make_engine` so the STS
and classification evaluators measure identical configurations.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

# Honor JAX_PLATFORMS=cpu even when a TPU plugin is installed (the env var
# alone does not override a plugin backend) — same contract as the CLI.
if os.environ.get("JAX_PLATFORMS", "").lower().split(",")[0].strip() == "cpu":
    import jax

    jax.config.update("jax_platforms",
                      os.environ["JAX_PLATFORMS"].lower())

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")

MODES = ("f32", "f16", "q4_0", "q4_1", "int8")

# model-architecture presets (n_embd, n_intermediate, n_head, n_layer)
ARCHS = {
    "minilm_l6": (384, 1536, 12, 6),
    "minilm_l12": (384, 1536, 12, 12),
    "bert_base": (768, 3072, 12, 12),
    # the H=16/D=1024/24L class (bge-large shape) — the largest family the
    # engine targets; no reference quality row exists for it (the
    # reference never ran an L24 model), so these numbers are beyond-parity
    "bge_large": (1024, 4096, 16, 24),
}


def build_eval_vocab_tokens(texts: Sequence[str]) -> List[str]:
    """30522-slot vocab covering every word in ``texts``.

    Specials and single chars sit at their real bert-base-uncased ids
    (matching tests/fixture_vocab.py so tokenizer goldens stay valid);
    dataset words fill the free id space from 2000 up, in deterministic
    sorted order. Unused slots are [unusedN] placeholders that can never
    collide with tokenizer output."""
    from fixture_vocab import KNOWN_TOKENS, VOCAB_SIZE

    from bert_tpu.tokenizer import normalize, split_words

    words = set()
    for t in texts:
        words.update(split_words(normalize(t)))
    tokens = [f"[unused{i}]" for i in range(VOCAB_SIZE)]
    used = set()
    for tok, tid in KNOWN_TOKENS.items():
        tokens[tid] = tok
        used.add(tid)
    known = set(KNOWN_TOKENS)
    free = (i for i in range(2000, VOCAB_SIZE) if i not in used)
    for w in sorted(words):
        if w in known:
            continue
        tokens[next(free)] = w
    return tokens


def build_fixture_model(path: str, tokens: Sequence[str],
                        arch: str = "minilm_l6", ftype: int = 0,
                        seed: int = 0) -> str:
    """Write a shape-identical random-weight ggml-bin with this vocab."""
    from bert_tpu.formats import GgmlHParams, write_ggml
    from bert_tpu.params import BertConfig, random_named_tensors

    d, f, h, l = ARCHS[arch]
    cfg = BertConfig(n_vocab=len(tokens), n_max_tokens=512, n_embd=d,
                     n_intermediate=f, n_head=h, n_layer=l)
    hp = GgmlHParams(cfg.n_vocab, cfg.n_max_tokens, cfg.n_embd,
                     cfg.n_intermediate, cfg.n_head, cfg.n_layer,
                     ftype=ftype)
    write_ggml(path, hp, list(tokens), random_named_tensors(cfg, seed))
    return path


def default_fixture_model(arch: str = "minilm_l6") -> str:
    """The shared offline fixture model: ONE vocab covering every committed
    dataset (both evaluators must use the same model file — a vocab built
    from only one dataset would silently drop the other's words).

    The /tmp cache is validated against a content hash of the source
    datasets (sidecar file): editing benchmarks/data/*.tsv regenerates the
    model instead of silently reusing a vocab that no longer covers the
    new words. The model PATH stays hash-free so results/ dir names (the
    committed quality tables) remain stable."""
    import hashlib

    path = f"/tmp/fixture-{arch.replace('_', '-')}"
    h = hashlib.sha1()
    for fname in ("sts_en.tsv", "emotion_en.tsv"):
        with open(os.path.join(DATA_DIR, fname), "rb") as f:
            h.update(f.read())
    digest = f"{arch}:{h.hexdigest()}"
    sidecar = path + ".src.sha1"
    fresh = False
    if os.path.exists(path) and os.path.exists(sidecar):
        with open(sidecar, encoding="utf-8") as f:
            fresh = f.read().strip() == digest
    if not fresh:
        texts: List[str] = []
        s1, s2, _ = read_sts_pairs(os.path.join(DATA_DIR, "sts_en.tsv"))
        texts += s1 + s2
        _, t = read_labeled(os.path.join(DATA_DIR, "emotion_en.tsv"))
        texts += t
        build_fixture_model(path, build_eval_vocab_tokens(texts), arch=arch)
        with open(sidecar, "w", encoding="utf-8") as f:
            f.write(digest)
    return path


def make_engine(model_path: str, mode: str, *, max_batch: int = 1024,
                pooling: str = "mean"):
    """One engine per quality mode, mirroring the reference's four file
    dtypes plus our W8A8 opt-in:

      f32    dense weights, f32 activations (exactness anchor)
      f16    dense weights, bf16 activations (the TPU serving default;
             NOTE: 'f16' is the reference's MODE NAME — on TPU the
             compute dtype is bfloat16, there is no f16 compute path.
             Results written under this label carry compute="bf16")
      q4_0   INT4 symmetric weight quantization
      q4_1   INT4 asymmetric (scale+min)
      int8   W8A8: per-column int8 weights AND int8 activations on the
             int8 MXU (int8_threshold=0: batch-size-consistent)
    """
    import jax.numpy as jnp

    from bert_tpu import BertTPU
    from bert_tpu.quant import FTYPE_BY_NAME

    # ALWAYS explicit: the result is labeled with this pooling, so the
    # engine must not be allowed to auto-detect something else from an HF
    # dir's 1_Pooling config (review r4 — a "mean"-labeled run of a CLS
    # checkpoint would silently measure CLS). CLS = BGE-family semantics:
    # quant noise on a single token's vector instead of averaged over the
    # sentence, measured separately from mean.
    kw = {"max_batch": max_batch, "pooling": pooling}
    if mode == "f32":
        kw["compute_dtype"] = jnp.float32
    elif mode == "f16":
        # explicit, not the engine default: the default is backend-dependent
        # (f32 on CPU) and would silently re-measure f32 there
        kw["compute_dtype"] = jnp.bfloat16
    elif mode in ("q4_0", "q4_1"):
        kw["quantize_ftype"] = FTYPE_BY_NAME[mode]
    elif mode == "int8":
        kw["int8_eval"] = True
        kw["int8_threshold"] = 0
    else:
        raise ValueError(f"unknown mode {mode!r} (have {MODES})")
    return BertTPU.from_file(model_path, **kw)


def result_dir(model_path: str, mode: str, pooling: str = "mean",
               backend: str = "cpu") -> str:
    """Results are keyed by (model, pooling, BACKEND, mode) so a TPU run
    lands alongside the CPU tier instead of overwriting it (VERDICT r4 #1:
    both numerics regimes must stay committed side by side). CPU keeps the
    historical un-tagged names; any other backend is tagged on the model
    part (``fixture-minilm-l6@tpu_q4_0``) so print_tables.py's
    ``<model>_<mode>`` split still parses and groups per backend."""
    name = os.path.basename(os.path.normpath(model_path))
    suffix = "" if pooling == "mean" else f"-{pooling}"
    tag = "" if backend == "cpu" else f"@{backend}"
    out = os.path.join(RESULTS_DIR, f"{name}{suffix}{tag}_{mode}")
    os.makedirs(out, exist_ok=True)
    return out


def read_sts_pairs(path: str) -> Tuple[List[str], List[str], np.ndarray]:
    s1, s2, gold = [], [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            s1.append(parts[0])
            s2.append(parts[1])
            gold.append(float(parts[2]))
    if not gold:
        raise ValueError(f"no pairs parsed from {path}")
    return s1, s2, np.asarray(gold)


def read_labeled(path: str) -> Tuple[List[str], List[str]]:
    """label<TAB>text per line → (labels, texts)."""
    labels, texts = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t", 1)
            if len(parts) != 2:
                continue
            labels.append(parts[0])
            texts.append(parts[1])
    if not texts:
        raise ValueError(f"no labeled rows parsed from {path}")
    return labels, texts

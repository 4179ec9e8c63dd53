"""Checkpointing: native weight cache + training-state save/resume.

The reference has no checkpoint story (inference-only; "resume" = reload
the .bin, SURVEY.md §5.4). Here:

  * :func:`save_params` / :func:`load_params` — a native ``.npz`` weight
    cache holding the stacked, MXU-tiled params pytree (QuantTensors kept
    packed). Loading it skips ggml parsing, per-layer stacking and
    quantization/repacking — the memoized "TPU-friendly layout" artifact.
  * :func:`save_train_state` / :func:`load_train_state` — orbax-backed
    checkpoint/resume for contrastive fine-tuning (bert_tpu.train).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from .params import BertConfig
from .quant import QuantTensor

_FORMAT_VERSION = 1


def _flatten(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for group, sub in params.items():
        for key, val in sub.items():
            base = f"{group}/{key}"
            if isinstance(val, QuantTensor):
                flat[base + ".packed"] = np.asarray(val.packed)
                flat[base + ".scales"] = np.asarray(val.scales)
                if val.mins is not None:
                    flat[base + ".mins"] = np.asarray(val.mins)
            else:
                flat[base] = np.asarray(val)
    return flat


def save_params(path: str, params: Dict[str, Any], config: BertConfig,
                vocab_tokens=None, pooling=None) -> None:
    if not path.endswith(".npz"):
        # np.savez would silently append ".npz", landing the file at a
        # different path than requested — and loader.load_model dispatches
        # on the suffix, so the caller's original path would then misroute
        # to the ggml parser (review r4)
        raise ValueError(f"weight-cache path must end in .npz, got {path!r}")
    meta = dict(config.__dict__)
    meta["__format_version__"] = _FORMAT_VERSION
    if pooling is not None:
        # pooling is a model property (mean vs cls, engine.py) — the cache
        # must carry it or a CLS model reloads as mean (review r4)
        meta["__pooling__"] = pooling
    extra = {}
    if vocab_tokens is not None:
        extra["__vocab__"] = np.asarray(list(vocab_tokens), dtype=np.str_)
    np.savez(path, __meta__=json.dumps(meta), **extra, **_flatten(params))


def load_params(path: str) -> Tuple[BertConfig, Dict[str, Any]]:
    config, params, _, _ = load_params_and_vocab(path)
    return config, params


def load_params_and_vocab(path: str):
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        version = meta.pop("__format_version__", 0)
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported weight-cache version {version}")
        pooling = meta.pop("__pooling__", None)
        config = BertConfig(**meta)
        vocab_tokens = ([str(t) for t in z["__vocab__"]]
                        if "__vocab__" in z else None)
        params: Dict[str, Dict[str, Any]] = {}
        names = [n for n in z.files if n not in ("__meta__", "__vocab__")]
        quant_bases = {n.rsplit(".", 1)[0] for n in names
                       if n.endswith(".packed")}
        done = set()
        for name in names:
            base = name.rsplit(".", 1)[0] if "." in name.split("/")[-1] \
                else name
            if base in done:
                continue
            group, key = base.split("/", 1)
            params.setdefault(group, {})
            if base in quant_bases:
                params[group][key] = QuantTensor(
                    packed=z[base + ".packed"],
                    scales=z[base + ".scales"],
                    mins=z[base + ".mins"] if base + ".mins" in z else None,
                )
            else:
                params[group][key] = z[name]
            done.add(base)
    return config, params, vocab_tokens, pooling


# --- training state (orbax) -------------------------------------------------

def save_train_state(ckpt_dir: str, state) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(ckpt_dir, state, force=True)


def load_train_state(ckpt_dir: str, target):
    """Restore into the structure of ``target`` (an initialized TrainState)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(ckpt_dir, item=target)

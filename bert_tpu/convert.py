"""Model conversion & quantization tooling (the reference's L2 layer).

Covers:
  * HF checkpoint dir → ggml-bin f32/f16 (models/convert-to-ggml.py):
    same header, same vocab framing, same skip list
    (embeddings.position_ids, pooler.dense.*), same "2-D .weight tensors
    take the file dtype" rule, same reversed-dims tensor records;
  * ggml-bin f32/f16 → Q4_0/Q4_1 re-encode (models/quantize.cpp), with the
    same observable outputs: per-tensor log lines and 16-bin nibble code
    histograms, per tensor and global (quantize.cpp:229-261);
  * both are drop-in CLI tools under tools/.

The TPU engine can also load HF checkpoints directly
(bert_tpu.loader.load_hf_model) — the .bin is for interchange with the
reference ecosystem, not a required intermediate.
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, Optional

import numpy as np

from .formats.ggml_bin import (
    GgmlHParams,
    _tensor_ftype_for,
    read_ggml,
    write_ggml,
)
from .quant import (
    FTYPE_NAMES,
    GGML_FTYPE_F16,
    GGML_FTYPE_F32,
    GGML_FTYPE_Q4_0,
    GGML_FTYPE_Q4_1,
    ggml_nbytes,
    nibble_histogram,
)

CONVERT_SKIP = ("embeddings.position_ids", "pooler.dense.weight",
                "pooler.dense.bias")  # convert-to-ggml.py:86-87


def convert_hf_to_ggml(model_dir: str, out_path: Optional[str] = None,
                       ftype: int = GGML_FTYPE_F16) -> str:
    """HF BERT checkpoint directory → ggml-bin file. Returns output path."""
    from .loader import _detect_pooling, _hf_state_dict

    assert ftype in (GGML_FTYPE_F32, GGML_FTYPE_F16)
    if _detect_pooling(model_dir) == "cls":
        # the ggml format (convert-to-ggml.py:68-75) has no pooling field,
        # so the checkpoint's declared CLS pooling cannot travel with the
        # file — loaders must be told explicitly
        print(f"warning: {model_dir} declares CLS pooling "
              "(1_Pooling/config.json); the ggml-bin format cannot record "
              "it — load the converted file with pooling='cls' "
              "(--pooling cls)", file=sys.stderr)
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    with open(os.path.join(model_dir, "vocab.txt"), encoding="utf-8") as f:
        vocab = [line.rstrip("\n") for line in f][: cfg["vocab_size"]]

    hp = GgmlHParams(
        n_vocab=cfg["vocab_size"],
        n_max_tokens=cfg["max_position_embeddings"],
        n_embd=cfg["hidden_size"],
        n_intermediate=cfg["intermediate_size"],
        n_head=cfg["num_attention_heads"],
        n_layer=cfg["num_hidden_layers"],
        ftype=ftype,
    )
    named = _hf_state_dict(model_dir)
    tensors: Dict[str, np.ndarray] = {}
    order = []
    for name, arr in named.items():
        if name in CONVERT_SKIP:
            continue
        tensors[name] = arr
        order.append(name)

    if out_path is None:
        suffix = {GGML_FTYPE_F32: "f32", GGML_FTYPE_F16: "f16"}[ftype]
        out_path = os.path.join(model_dir, f"ggml-model-{suffix}.bin")
    write_ggml(out_path, hp, vocab, tensors, tensor_order=order)
    return out_path


def quantize_ggml(in_path: str, out_path: str, ftype: int,
                  log=print) -> Dict[str, int]:
    """Re-encode an f32/f16 ggml-bin to Q4_0/Q4_1.

    Same eligibility rule as the reference (2-D ``*.weight``,
    quantize.cpp:154-167); prints per-tensor and global nibble histograms.
    Returns {"total_in": bytes, "total_out": bytes}.
    """
    assert ftype in (GGML_FTYPE_Q4_0, GGML_FTYPE_Q4_1)
    mf = read_ggml(in_path)
    if mf.hparams.ftype not in (GGML_FTYPE_F32, GGML_FTYPE_F16):
        raise ValueError(
            f"source must be f32/f16, got {FTYPE_NAMES[mf.hparams.ftype]}"
        )

    hp = GgmlHParams(**{**mf.hparams.__dict__})
    hp.ftype = ftype

    tensors: Dict[str, np.ndarray] = {}
    total_in = 0
    for name, rec in mf.tensors.items():
        tensors[name] = rec.to_f32()
        # reuse the materialized copy: to_f32() is uncached and a second
        # call would re-dequantize the whole tensor just to read .size
        # (~1.3 GB of extra first-touch pages on a bge-large f16 file)
        total_in += tensors[name].size * (2 if rec.ftype == GGML_FTYPE_F16
                                          else 4)

    # write first (the writer quantizes each eligible tensor exactly once),
    # then read the produced records back for the histograms — re-reading
    # the small output file is far cheaper than quantizing twice
    write_ggml(out_path, hp, mf.vocab_tokens, tensors,
               tensor_order=list(mf.tensors))

    out_mf = read_ggml(out_path)
    global_hist = np.zeros(16, dtype=np.int64)
    total_out = 0
    for name, rec in out_mf.tensors.items():
        nbytes_out = ggml_nbytes(rec.shape, rec.ftype)
        total_out += nbytes_out
        if rec.ftype == ftype:
            hist = nibble_histogram(rec.codes)
            global_hist += hist
            log(f"{name:>48s} - {list(rec.shape)} → {FTYPE_NAMES[ftype]} "
                f"{nbytes_out / 1e6:7.2f} MB | hist "
                + " ".join(f"{h / max(rec.codes.size, 1):.3f}"
                           for h in hist))
        else:
            log(f"{name:>48s} - {list(rec.shape)} kept f32")
    tot = max(int(global_hist.sum()), 1)
    log("global code histogram: "
        + " ".join(f"{h / tot:.3f}" for h in global_hist))
    log(f"size: {total_in / 1e6:.2f} MB → {total_out / 1e6:.2f} MB")
    return {"total_in": total_in, "total_out": total_out}

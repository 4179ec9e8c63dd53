#!/usr/bin/env python
"""HF checkpoint dir → ggml-bin (counterpart of models/convert-to-ggml.py).

Usage: python tools/convert_hf.py <model-dir-or-hub-name> [0|1]
  0 → f32, 1 → f16 (default 1)

If the directory is missing and the HF hub is reachable, downloads
``sentence-transformers/<name>`` first (same convenience as the reference;
gracefully errors offline).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bert_tpu.convert import convert_hf_to_ggml


def ensure_local(dir_model: str) -> str:
    if os.path.exists(dir_model):
        return dir_model
    name = f"sentence-transformers/{dir_model}"
    print(f"{dir_model} not found locally; trying HF hub ({name}) ...")
    try:
        from transformers import AutoModel, AutoTokenizer

        AutoTokenizer.from_pretrained(name).save_pretrained(dir_model)
        AutoModel.from_pretrained(name).save_pretrained(dir_model)
        return dir_model
    except Exception as exc:
        sys.exit(f"cannot download {name!r} (offline?): {exc}")


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    dir_model = ensure_local(sys.argv[1])
    ftype = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    if ftype not in (0, 1):
        sys.exit(f"invalid ftype {ftype} (0=f32, 1=f16)")
    out = convert_hf_to_ggml(dir_model, ftype=ftype)
    print(f"Done. Output file: {out}")


if __name__ == "__main__":
    main()

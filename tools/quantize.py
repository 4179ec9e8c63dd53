#!/usr/bin/env python
"""Quantize an f32/f16 ggml-bin model to Q4_0/Q4_1
(counterpart of the reference's models/quantize binary).

Usage: python tools/quantize.py <in.bin> <out.bin> <2|3|q4_0|q4_1>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bert_tpu.convert import quantize_ggml
from bert_tpu.quant import FTYPE_BY_NAME


def main() -> None:
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    in_path, out_path, mode = sys.argv[1:4]
    ftype = FTYPE_BY_NAME.get(mode, None)
    if ftype is None:
        try:
            ftype = int(mode)
        except ValueError:
            sys.exit(f"invalid type {mode!r}")
    if ftype not in (2, 3):
        sys.exit("type must be 2 (q4_0) or 3 (q4_1)")
    quantize_ggml(in_path, out_path, ftype)


if __name__ == "__main__":
    main()

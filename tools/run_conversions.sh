#!/usr/bin/env bash
# Produce all 4 dtypes for a model (counterpart of models/run_conversions.sh):
#   f32, f16 via convert_hf.py; q4_0, q4_1 via quantize.py from the f32 file.
set -euo pipefail
MODEL=${1:?usage: run_conversions.sh <model-dir-or-hub-name>}
HERE=$(dirname "$0")

python "$HERE/convert_hf.py" "$MODEL" 0
python "$HERE/convert_hf.py" "$MODEL" 1
python "$HERE/quantize.py" "$MODEL/ggml-model-f32.bin" "$MODEL/ggml-model-q4_0.bin" 2
python "$HERE/quantize.py" "$MODEL/ggml-model-f32.bin" "$MODEL/ggml-model-q4_1.bin" 3

#!/bin/bash
# Regenerate every committed offline quality result (VERDICT r3 #3/#4):
#   4 fixture architectures x 5 modes x {STS-en, Emotion k-fold, synthetic STS}
# Runs on whatever backend JAX_PLATFORMS selects (results carry a
# "backend" provenance field). ~45 evaluator runs; each is a fresh
# process so a failure never poisons the rest.
set -u
cd "$(dirname "$0")/.."

ARCHS=${ARCHS:-"minilm_l6 minilm_l12 bert_base bge_large"}
MODES=${MODES:-"f32 f16 q4_0 q4_1 int8"}
PAIRS=/tmp/pairs.tsv

[ -f $PAIRS ] || python benchmarks/make_synthetic_sts.py -n 512 -o $PAIRS

for arch in $ARCHS; do
  for mode in $MODES; do
    echo "=== $arch / $mode ==="
    timeout 1200 python benchmarks/eval_sts_local.py --fixture --arch "$arch" --mode "$mode" \
      || echo "FAILED sts-en $arch $mode"
    timeout 1200 python benchmarks/eval_classification_local.py --fixture --arch "$arch" --mode "$mode" \
      || echo "FAILED emotion $arch $mode"
    timeout 1200 python benchmarks/eval_sts_local.py --fixture --arch "$arch" --mode "$mode" $PAIRS \
      || echo "FAILED sts-synth $arch $mode"
  done
done
echo "done; results under benchmarks/results/fixture-*"

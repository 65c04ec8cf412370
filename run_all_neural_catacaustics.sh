#!/bin/bash
# Twin of reference run_all_neural_catacaustics.sh: real-scene overrides.
set -e
DATA=${DATA:-data/catacaustics}
OUT=${OUT:-output}
for SCENE in bear multibounce; do
  ./run.sh "$DATA/$SCENE" "$OUT/$SCENE" \
    --loss_weight_depth 0.0 --loss_weight_specular 0.01 --init_scale 0.1 \
    --disable_znear_densif_pruning --clamp_max 5.0 "$@"
done

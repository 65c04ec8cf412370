#!/bin/bash
# Twin of reference run_all_synthetic_priors.sh: shiny scenes trained from
# network-predicted prior buffers (renders_priors layout -> BlenderPriorDataset).
set -e
DATA=${DATA:-data/renders_priors}
OUT=${OUT:-output/renders_priors}
for SCENE in shiny_kitchen shiny_livingroom shiny_office; do
  ./run.sh "$DATA/$SCENE" "$OUT/$SCENE" "$@"
done

#!/bin/bash
# Twin of reference run_all_synthetic.sh: train all shiny GT scenes.
set -e
DATA=${DATA:-data/renders}
OUT=${OUT:-output}
for SCENE in shiny_kitchen shiny_office shiny_livingroom shiny_bedroom; do
  ./run.sh "$DATA/$SCENE" "$OUT/$SCENE" "$@"
done

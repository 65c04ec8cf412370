#!/bin/bash
# Twin of reference scripts/run_bear_scene_legacy_sfm.sh: the bear scene with
# SfM (COLMAP points) initialization instead of dense depth unprojection.
set -e
./run_real_scene.sh data/neural_catacaustics/multibounce output/neural_catacaustics/multibounce \
  --loss_weight_depth 0.1 --loss_weight_specular 0.01 --init_scale 1.5 \
  --clamp_max 5.0 --disable_znear_densif_pruning --init_type sfm "$@"

#!/bin/bash
# Twin of reference scripts/prepare_initial_plys.sh: dense-init PLYs for a
# scene group.  Pick the group via env vars (defaults = neural_catacaustics,
# matching the reference's uncommented block).
set -xe

export OPENCV_IO_ENABLE_OPENEXR=1

SCENE_DIR=${SCENE_DIR:-data/neural_catacaustics}
SCENE_LIST=${SCENE_LIST:-"compost concave_bowl2 crazy_blade2 hallway_lamp multibounce silver_vase2 wateringcan2"}
RESOLUTION=${RESOLUTION:-128}
VOXEL_SCALE=${VOXEL_SCALE:-50}

for SCENE in $SCENE_LIST; do
  python prepare_initial_ply.py \
    --source_path "$SCENE_DIR/$SCENE" \
    --resolution "$RESOLUTION" \
    --do_depth_fit \
    --voxel_scale "$VOXEL_SCALE"
done

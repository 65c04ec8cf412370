#!/bin/bash
# Twin of reference scripts/transforms_from_colmap.sh: convert a COLMAP sparse
# model to transforms_train.json via colmap2nerf.  Needs the external `colmap`
# binary only for bin->txt conversion; if the sparse model is already in text
# form the colmap step is skipped.
set -e
SCENE=${1?Please provide scene path as first argument}

if [ ! -f "$SCENE/sparse/0/images.txt" ]; then
  colmap model_converter \
    --input_path "$SCENE/sparse/0" \
    --output_path "$SCENE/sparse/0" \
    --output_type TXT
  CONVERTED=1
fi

python tools/colmap2nerf.py \
  --images "$SCENE/images" \
  --text "$SCENE/sparse/0" \
  --out "$SCENE/transforms_train.json" \
  --keep_colmap_coords

if [ -n "$CONVERTED" ]; then rm "$SCENE"/sparse/0/*.txt; fi

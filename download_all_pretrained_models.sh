#!/bin/bash
# Twin of reference download_all_pretrained_models.sh.  Pretrained model dirs
# are self-contained (point_cloud/iteration_N/point_cloud.ply + cfg.json +
# transforms + bounding_boxes.json) and load directly into our viewer/render
# CLIs - the PLY schema is byte-compatible (utils/ply.py).
set -e
echo "Downloading all models to pretrained/ ..."
mkdir -p pretrained

BASE=https://repo-sam.inria.fr/nerphys/editable-gaussian-reflections/pretrained
for NAME in shiny_kitchen_no_eval shiny_office_no_eval shiny_livingroom_no_eval multibounce_pre-edited; do
  (wget "$BASE/$NAME.zip" -O "pretrained/$NAME.zip" &&
   python -m zipfile -e "pretrained/$NAME.zip" pretrained/ && rm "pretrained/$NAME.zip") &
done
wait

echo "All models downloaded and extracted to pretrained/."

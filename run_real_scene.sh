#!/bin/bash
# Twin of reference run_real_scene.sh: train one real scene then render the
# spiral novel-view videos.  Usage: ./run_real_scene.sh SOURCE MODEL [overrides]
set -e
SOURCE=$1
MODEL=$2
shift 2
python train.py -s "$SOURCE" -m "$MODEL" "$@"
bash render_novel_views.sh "$MODEL"

#!/bin/bash
# Twin of reference run.sh: train + render + metrics + fps for one scene.
set -e
SOURCE=$1
MODEL=$2
shift 2
python train.py -s "$SOURCE" -m "$MODEL" "$@"
if [ -z "$SKIP_EVAL" ]; then
  python render.py -m "$MODEL"
  python metrics.py -m "$MODEL"
fi
python measure_fps.py -m "$MODEL"

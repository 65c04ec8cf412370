#!/bin/bash
# Twin of reference scripts/dryrun.sh: the full regression pipeline at toy
# scale (train 100 iters -> render -> novel views -> fps).
set -e
SOURCE=${1:-/tmp/synth_scene}
MODEL=${2:-/tmp/dryrun_model}
if [ ! -f "$SOURCE/transforms_train.json" ]; then
  python -c "import sys; sys.path.insert(0,'tests'); from make_synth_dataset import make_dataset; make_dataset('$SOURCE', size=64, n_train=4, n_test=2)"
fi
python train.py -s "$SOURCE" -m "$MODEL" -r 64 --iterations 100 \
  --no_bounces_until_iter 20 --test_iterations 100 --save_iterations 100 \
  --max_images 2 --trace_chunk 256 --ray_tile 4096 --init_num_pts_farfield 512
python render.py -m "$MODEL" --spp 4 --skip_video
python tools/render_novel_views.py -m "$MODEL" --spp 1 --n_views 4 --no_denoise
python measure_fps.py -m "$MODEL"

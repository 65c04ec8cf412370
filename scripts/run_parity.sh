#!/bin/bash
# Reference-scale parity protocol (VERDICT r1 item 3) on the synthetic room
# stand-in (no shiny_* data reachable offline): 100k dense + 75k far-field
# init, the FULL reference schedule (8000 iters, bounce warmup at 750, prune
# every 125 after 1250, saves at [1,750,3000,8000]), then the reference eval
# protocol: 128 spp + denoise, tonemapped clamped PSNR (render.py:31-36,
# README.md:144-150).  Resolution is the one deviation from spec (-r 256 vs
# 768): single-chip wall-clock - the 768px it/s is recorded alongside.
set -e
SOURCE=${1:-/tmp/parity_dataset}
MODEL=${2:-/tmp/parity_model}
RES=${3:-256}

NO_WORKERS=1 python train.py -s "$SOURCE" -m "$MODEL" -r "$RES" \
  --iterations 8000 --no_bounces_until_iter 750 \
  --test_iterations 1 750 3000 8000 --save_iterations 1 750 3000 8000 \
  --ray_tile 65536 --backend pallas
python render.py -m "$MODEL" --spp 128 --skip_video
python metrics.py -m "$MODEL" --metrics psnr ssim lpips \
  --render_passes diffuse specular render
python measure_fps.py -m "$MODEL"

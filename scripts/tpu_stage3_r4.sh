#!/bin/bash
# Round-4 stage 3: after the scan-mode bench releases the TPU -
#  1. denoiser_eval with the demodulated-specular path (VERDICT #6)
#  2. parity dataset regen (the /tmp copy was wiped)
#  3. the diffuse-decay experiment: r3 parity protocol to 3000 iters on the
#     precision-fixed kernels, dense eval cadence (VERDICT #4)
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r4_backlog
mkdir -p "$OUT"

# wait for the scan bench to release the TPU
while [ -e /proc/"$(cat /tmp/bscan.pid 2>/dev/null || echo 0)" ]; do
  sleep 30
done

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

run probe3 300 python -c "import jax; print(jax.devices())"
grep -q "rc=0" <(tail -1 "$OUT/backlog.log") || { echo "TPU DOWN"; exit 1; }

run denoiser_eval 3600 python tools/denoiser_eval.py

if [ ! -d /tmp/parity_dataset ]; then
  run make_dataset 5400 python tools/make_room_dataset.py \
    --out /tmp/parity_dataset --size 512 --n_train 100 --n_test 4 --spp 8
fi

run parity_r4 14400 env NO_WORKERS=1 python train.py --resume \
  -s /tmp/parity_dataset -m /tmp/parity_r4 -r 256 \
  --iterations 3000 --no_bounces_until_iter 750 \
  --test_iterations 1 250 500 750 1000 1250 1500 2000 2500 3000 \
  --save_iterations 750 3000 \
  --ray_tile 65536 --backend pallas
mkdir -p artifacts/parity_r4
cp /tmp/parity_r4/*_validation_scores.csv /tmp/parity_r4/cfg.json \
   /tmp/parity_r4/num_gaussians.txt /tmp/parity_r4/time.txt \
   artifacts/parity_r4/ 2>/dev/null

echo STAGE3_DONE | tee -a "$OUT/backlog.log"

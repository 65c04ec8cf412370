#!/bin/bash
# Round-5 hardware window 9: the parity probe for the diffuse-decay /
# far-field-overflow question (VERDICT r4 #5), sized to what a ~2h session
# can actually land.  Differences vs the lost window-5 chain:
#   - dataset at 256px/spp4 (native -r 256, ~4x cheaper to generate than
#     the r4 512px/spp8 recipe; same scene, same view distribution)
#   - 3000 iters (the horizon where r4's decay was unambiguous:
#     test diffuse 22.38@750 -> 20.61@3000), hedge saves every 750
#   - CSV snapshots into artifacts/parity_r5_probe after every step AND
#     from a background snap loop, so a mid-train kill still leaves the
#     trajectory in the repo
#   - the tcut sweep + bench run AFTER (opportunistic)
set -x
cd "$(dirname "$0")/.."
OUT=artifacts/r5_backlog3
PROBE=artifacts/parity_r5_probe
mkdir -p "$OUT" "$PROBE"

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$OUT/backlog.log"
  ( timeout "$t" "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ===" | tee -a "$OUT/backlog.log"
}

snap() {
  cp /tmp/probe_model/*.csv /tmp/probe_model/cfg.json /tmp/probe_model/time.txt \
     /tmp/probe_model/num_gaussians.txt "$PROBE/" 2>/dev/null || true
}

if [ ! -d /tmp/probe_ds ]; then
  run probe_ds 1800 python tools/make_room_dataset.py \
    --out /tmp/probe_ds --size 256 --n_train 100 --n_test 4 --spp 4
fi

# background snap loop (dies with the script)
( while true; do sleep 120; snap; done ) & SNAP_PID=$!
trap 'kill $SNAP_PID 2>/dev/null' EXIT

run probe_train 4200 env NO_WORKERS=1 python train.py --resume \
  -s /tmp/probe_ds -m /tmp/probe_model -r 256 --iterations 3000 \
  --no_bounces_until_iter 750 --min_weight 0.011 \
  --test_iterations 1 250 500 750 1000 1250 1500 1750 2000 2250 2500 2750 3000 \
  --save_iterations 750 1500 2250 3000 \
  --ray_tile 65536 --backend pallas
snap
echo PROBE_TRAIN_DONE | tee -a "$OUT/backlog.log"

run tcut_sweep 2400 python tools/bench_scan_mode.py --iters 4 --configs \
kbuffer:128:16:128:768,\
scanq:128:16:128:768:tcut=0.003:ns=1:ap=bf16,\
scanq:128:16:128:768:tcut=0.01:ns=1:ap=bf16,\
scanq:128:16:112:704:tcut=0.003:ns=1:ap=bf16

run bench_final 1500 python bench.py

run probe_fps 900 python measure_fps.py -m /tmp/probe_model
cp /tmp/probe_model/fps.json "$PROBE/" 2>/dev/null || true
snap

echo WINDOW9_R5_DONE | tee -a "$OUT/backlog.log"

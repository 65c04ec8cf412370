#!/bin/bash
# Round-5 hardware window 11: runs after window 10 has left a trained probe
# checkpoint in /tmp/probe_model.  Lands the two remaining hardware
# artifacts: the viewer drag-path FPS trace (VERDICT r4 #8) and the per-spp
# denoiser eval sweep on a real trained checkpoint, then a final bench.py
# validation with the adaptive-warmup fix.
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

# viewer FPS drag trace @512px (service in background, scan drag path)
( timeout 1400 python -m editable_gaussian_reflections_tpu.viewer.service \
    -m /tmp/probe_model -r 512 >"$OUT/service.log" 2>&1 & echo $! > /tmp/svc.pid )
sleep 400  # lazy axon compile of the preview pipeline
run viewer_fps 800 python tools/viewer_client.py --frames 30 \
  --preview_scale 2 --fps_json "$OUT/viewer_fps_512.json" --out /tmp/viewer_frames
kill "$(cat /tmp/svc.pid)" 2>/dev/null
cp "$OUT/viewer_fps_512.json" "$PROBE/" 2>/dev/null || true

# per-spp denoiser eval on the trained checkpoint
run probe_eval_sweep 1200 python tools/eval_sweep.py -m /tmp/probe_model
cp /tmp/probe_model/eval_sweep*.json "$PROBE/" 2>/dev/null || true

run bench_final 1800 python bench.py

echo WINDOW11_R5_DONE | tee -a "$OUT/backlog.log"

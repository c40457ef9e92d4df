#!/bin/bash
# Round-2 TPU work queue v8 — evaluate the low-fill fine-tune.
#
# Queue v7's stage 1 produced runs/run00004 (40 epochs from run00001,
# minFillRate 0.05), but its eval stages pointed at the wrong run dir
# (`ls | tail -1` picked up empty debris dirs from concurrent smoke
# runs).  Re-run both evals against run00004 explicitly:
#   1. held-out crops eval (guard: no interior regression vs run00001)
#   2. all-angles harness bilinear vs run00001 vs run00004 (the metric
#      that motivated the fine-tune: full-view shaded color)
#
# Serial on purpose: two concurrent TPU clients wedge the tunnel helper.
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

log "=== queue v8 start $(date -u) ==="

wait_up
timeout 2400 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2ao --samples 400 \
  --models bilinear runs/run00001 runs/run00004 \
  > /tmp/q8_eval_crops.log 2>&1
log "v8 s1 crops eval rc=$?"

wait_up
timeout 4500 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 \
  --models bilinear runs/run00001 runs/run00004 \
  --cameras 20 --output /tmp/q8_allangles \
  > /tmp/q8_allangles.log 2>&1
log "v8 s2 allangles rc=$?"

log "=== QUEUE v8 DONE $(date -u) ==="

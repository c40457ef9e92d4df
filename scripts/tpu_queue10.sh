#!/bin/bash
# Round-2 TPU work queue v10 — re-run the two judge-facing quality
# tables with today's protocol fixes:
#   - all-angles harness: AO_SAMPLES=0 now implies AO_STRENGTH=0
#     (the net's learned AO was being scored against AO-free GT)
#   - MS-SSIM: negative per-scale terms clamp to 0 instead of NaN
# Stages:
#   1. mainPSNR2 parity at the full operating point (128 -> 512 views,
#      20 cams x 6 rolls), bilinear vs run00001 vs run00004
#   2. same harness, AO-enabled variant (aoSamples 64, strength 0.8):
#      interpolation gets no AO input, the net predicts it
#   3. mainPSNR3 stats table re-run (NaN-free SSIM columns)
# Waits for queue v9 to finish first (single-client tunnel).
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

# serialize behind queue v9 (it logs this line when done)
until grep -q "QUEUE v9 DONE" "$S" 2>/dev/null; do sleep 60; done

log "=== queue v10 start $(date -u) ==="

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --lowRes 128 \
  --models bilinear runs/run00001 runs/run00004 \
  --cameras 20 --output /tmp/q10_allangles \
  > /tmp/q10_allangles.log 2>&1
log "v10 s1 allangles noAO rc=$?"

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --lowRes 128 --aoSamples 64 \
  --models bilinear runs/run00001 runs/run00004 \
  --cameras 20 --output /tmp/q10_allangles_ao \
  > /tmp/q10_allangles_ao.log 2>&1
log "v10 s2 allangles AO rc=$?"

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:turbulence:256 analytic:ejecta:256 \
            analytic:interface:256 \
  --models nearest bilinear bicubic runs/run00001 runs/run00004 \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q10_stats > /tmp/q10_stats.log 2>&1
log "v10 s3 psnr_stats rc=$?"

log "=== QUEUE v10 DONE $(date -u) ==="

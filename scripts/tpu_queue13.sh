#!/bin/bash
# Round-2 TPU work queue v13 — generalization eval on the CT pair.
#
# analytic:skull / analytic:thorax complete the reference's five-dataset
# eval coverage (mainPSNR3_AllStats.py:29-40); neither family appears in
# any training zoo, so this is a true unseen-content generalization test
# of the mix3 net (thin shells + sub-pixel rib rings are the hard cases).
# Waits for queue v12 to finish first (single-client tunnel).
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

until grep -q "QUEUE v12 DONE" "$S" 2>/dev/null; do sleep 60; done

log "=== queue v13 start $(date -u) ==="

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:skull:256 analytic:thorax:256 \
  --models nearest bilinear bicubic runs/run00001 runs/run00005 \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q13_stats > /tmp/q13_stats.log 2>&1
log "v13 s1 skull/thorax stats rc=$?"

log "=== QUEUE v13 DONE $(date -u) ==="

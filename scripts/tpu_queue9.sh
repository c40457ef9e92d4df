#!/bin/bash
# Round-2 TPU work queue v9 — the paper-statistics harness (mainPSNR3
# parity) for the trained runs: the one VERDICT item-1 gate artifact not
# yet produced (the crops table exists; the stats table does not).
# Waits for queue v8 to finish first (single-client tunnel).
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

# serialize behind queue v8
if [ -f /tmp/q8.pid ]; then
  while kill -0 "$(cat /tmp/q8.pid)" 2>/dev/null; do sleep 60; done
fi

log "=== queue v9 start $(date -u) ==="

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:turbulence:256 analytic:ejecta:256 \
            analytic:interface:256 \
  --models nearest bilinear bicubic runs/run00001 runs/run00004 \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q9_stats > /tmp/q9_stats.log 2>&1
log "v9 s1 psnr_stats rc=$?"

log "=== QUEUE v9 DONE $(date -u) ==="

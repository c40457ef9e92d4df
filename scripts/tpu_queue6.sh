#!/bin/bash
# Round-2 TPU work queue v6 — re-runs for the legs queue v5 lost:
#   1. bench_volumes 512,1024 dense — v5 s3's 512 leg hit the Mosaic SMEM
#      block error (fixed in 94a1dde, which landed 15 min after s3 ran),
#      and s4's 1024 leg timed out generating the volume (the uint8 cache
#      /tmp/blobs1024_u8.npz has since been built).
#   2. bench_volumes 1024 sparse — v5 s9's 1024 leg raced the cache
#      generator and fell into the device-side brick pyramid, whose
#      (…,8)-trailing reshape the TPU layout pads 16x (OOM).  The pyramid
#      is host-side now (volume/grid.py compute_brick_minmax).
#   3. all-angles harness — the metric now matches mainPSNR2 (unmasked
#      PSNR on normal + shaded color with background compositing); v5
#      s11's numbers used the quirky masked formula on mostly-empty
#      views and were meaningless (273 dB means).
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

log "=== queue v6 start $(date -u) ==="

wait_up
timeout 5400 python scripts/bench_volumes.py --res 512,1024 \
  > /tmp/q6_vol_dense.log 2>&1
log "v6 s1 bench 512/1024 dense rc=$?"

wait_up
timeout 5400 python scripts/bench_volumes.py --res 1024 --sparse \
  > /tmp/q6_vol1024_sparse.log 2>&1
log "v6 s2 bench 1024 sparse rc=$?"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --models bilinear runs/run00001 \
  --cameras 20 --output /tmp/q6_allangles \
  > /tmp/q6_allangles.log 2>&1
log "v6 s3 allangles rc=$?"

log "=== QUEUE v6 DONE $(date -u) ==="

#!/bin/bash
# Round-2 TPU work queue v4 — chains AFTER scripts/tpu_queue3.sh.
#
# v3 covers: stage-1 retrain on fixed-AO targets, eval, 512^3 training
# demo, dense bench_volumes 256/512/1024, headline bench, adversarial
# fine-tune, int8 A/B.  v4 adds the rows v3 predates:
#   1. bench_volumes 512^3 WITH the baked-AO tiled second pass
#      (ao_capture_tiled — the round-2 AO-on-the-fast-path work)
#   2. bench_volumes 512/1024^3 SPARSE (packed per-axis tile atlas,
#      atlas-indirect tiled march — the GVDB-parity storage)
#   3. sparse + AO together at 512^3 (pack_ao_axis keeps the full
#      reference G-buffer on packed volumes)
#   4. all-angles PSNR harness on the new stage-1 run (mainPSNR2 parity)
#   5. timings.csv comparison harness on the new run (mainComparison
#      parity, 1080p operating point)
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

# Gate: only start once queue v3 has fully drained the chip.
until grep -q "QUEUE v3 DONE" "$S" 2>/dev/null; do sleep 120; done
log "=== queue v4 start $(date -u) ==="

NEW=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
# v3's stage-7 adversarial run is newest; the stage-1 run precedes it.
STAGE1=$(ls -d runs/run00* 2>/dev/null | sort | tail -2 | head -1)
log "v4 using stage1=$STAGE1 newest=$NEW"

wait_up
timeout 3600 python scripts/bench_volumes.py --res 512 --ao \
  > /tmp/q4_vol512_ao.log 2>&1
log "v4 stage1 bench 512 +ao rc=$?"

wait_up
timeout 5400 python scripts/bench_volumes.py --res 512,1024 --sparse \
  > /tmp/q4_vol_sparse.log 2>&1
log "v4 stage2 bench 512/1024 sparse rc=$?"

wait_up
timeout 3600 python scripts/bench_volumes.py --res 512 --sparse --ao \
  > /tmp/q4_vol512_sparse_ao.log 2>&1
log "v4 stage3 bench 512 sparse+ao rc=$?"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --models bilinear "$STAGE1" \
  --cameras 20 --output /tmp/q4_allangles \
  > /tmp/q4_allangles.log 2>&1
log "v4 stage4 allangles ($STAGE1) rc=$?"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_comparison \
  --volume analytic:blobs --isovalue 0.36 --models bilinear "$STAGE1" \
  --output /tmp/q4_timings \
  > /tmp/q4_comparison.log 2>&1
log "v4 stage5 timings.csv ($STAGE1) rc=$?"

log "=== QUEUE v4 DONE $(date -u) ==="

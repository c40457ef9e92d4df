#!/bin/bash
# Round-2 TPU work queue v19 — self-contained relaunch of the v18
# gradient-difference-loss (GDL) attack after the VM recycle wiped /tmp
# (v18 was gated on a "QUEUE v17 DONE" marker that no longer exists).
#
# s1  warm retrain of the close-camera net (artifacts/run00007) on the
#     close-camera mix3 cache (regenerated — /tmp is empty) with
#     gdl:normal:5,gdl:depth:5 added — GDL charges hallucinated gradient
#     detail on smooth targets, the exact interface failure mode
#     (losses/builder.gradient_difference).
# s2  crops eval on the close-camera cache vs the GDL-free parent.
# s3  paper-stats on interface + turbulence (goal metric: interface
#     normals/depth vs bicubic; turbulence guards against smoothing
#     regression on high-frequency content).
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

log "=== queue v19 start $(date -u) ==="

PARENT=artifacts/run00007

wait_up
timeout 12000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix3 --numberOfImages 80 \
  --cameraDistance 0.6,1.3 \
  --cacheDataset /tmp/isosr_clips_mix3cd \
  --pretrained "$PARENT" \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 --epochs 60 \
  --lr 5e-5 --lrStep 30 --gradClip 1.0 --checkpointEvery 20 \
  --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:5,gdl:depth:5" \
  > /tmp/q19_train.log 2>&1
log "v19 s1 GDL retrain rc=$?"
NEW=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
if [ ! -f "$NEW/config.json" ] || [ ! -f "$NEW/params.npz" ]; then
  log "v19 s1 FAILED: $NEW incomplete; aborting queue"
  log "=== QUEUE v19 DONE $(date -u) ==="
  exit 1
fi
log "v19 s1 new run: $NEW"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3cd --samples 400 \
  --models bilinear "$PARENT" "$NEW" \
  > /tmp/q19_crops.log 2>&1
log "v19 s2 crops (close cache, gdl vs parent) rc=$?"

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:interface:256 analytic:turbulence:256 \
  --models bilinear bicubic "$PARENT" "$NEW" \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q19_stats > /tmp/q19_stats.log 2>&1
log "v19 s3 interface/turbulence psnr_stats rc=$?"
# keep the stats tables durable too
mkdir -p artifacts/quality && cp -r /tmp/q19_stats artifacts/quality/ 2>/dev/null

log "=== QUEUE v19 DONE $(date -u) ==="

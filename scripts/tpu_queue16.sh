#!/bin/bash
# Round-2 TPU work queue v16 — runs after v15 (close-camera retrain).
#
# s1  completes the five-dataset paper-stats coverage (skull + thorax
#     analogues were added in ca12446 but never had committed stats).
# s2  stage-2 adversarial + perceptual fine-tune from the v15 net
#     (trainAdv_v2 parity; random-VGG fallback is the documented state
#     of this environment).
# s3  crops eval of the adversarial net vs its stage-1 parent.
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

until grep -q "QUEUE v15 DONE" "$S" 2>/dev/null; do sleep 60; done

log "=== queue v16 start $(date -u) ==="

# v15's retrain run (NOT `tail -1`: v15 s3 creates a throwaway regen run)
NEW=$(grep "v15 s1 new run:" "$S" | tail -1 | awk '{print $NF}')
if [ ! -f "$NEW/config.json" ]; then
  log "v16: no v15 run found ($NEW); falling back to artifacts/run00005"
  NEW=artifacts/run00005
fi
log "v16 using net: $NEW"

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:skull:256 analytic:thorax:256 \
  --models bilinear bicubic artifacts/run00005 "$NEW" \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q16_stats > /tmp/q16_stats.log 2>&1
log "v16 s1 skull/thorax psnr_stats rc=$?"

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix3 --numberOfImages 80 \
  --cameraDistance 0.6,1.3 \
  --cacheDataset /tmp/isosr_clips_mix3cd \
  --pretrained "$NEW" \
  --advTraining --advDiscrLr 1e-4 \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 --epochs 30 \
  --lr 2e-5 --lrStep 30 --gradClip 1.0 --checkpointEvery 10 \
  --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,perceptual:color:0.02,texture:color:0.002,adv:all:0.3" \
  > /tmp/q16_adv.log 2>&1
log "v16 s2 adversarial fine-tune rc=$?"
ADV=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
if [ ! -f "$ADV/config.json" ]; then
  log "v16 s2 FAILED: $ADV has no config.json; skipping s3"
  log "=== QUEUE v16 DONE $(date -u) ==="
  exit 1
fi
log "v16 s2 adversarial run: $ADV"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3cd --samples 400 \
  --models bilinear "$NEW" "$ADV" \
  > /tmp/q16_crops.log 2>&1
log "v16 s3 crops (adv vs stage-1 parent) rc=$?"

log "=== QUEUE v16 DONE $(date -u) ==="

#!/bin/bash
# Round-2 TPU work queue v12 — post-retrain sweep-up.
#   1. AO-enabled all-angles retry (baked SH field fix; the hemisphere
#      oracle at 512^2 GT crashed the worker in v10 s2)
#   2. crops eval of the mix3 retrain on the OLD mix2ao cache: regression
#      guard on the original content
#   3. stage-2 adversarial + perceptual fine-tune from the mix3 net on
#      the mix3 cache, then crops eval of it
#   4. headline bench refresh (BENCH_r02 material)
# Waits for queue v11 to finish first (single-client tunnel).
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

until grep -q "QUEUE v11 DONE" "$S" 2>/dev/null; do sleep 60; done

log "=== queue v12 start $(date -u) ==="
NEW=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
log "v12 newest run: $NEW"

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --lowRes 128 --aoSamples 64 \
  --models bilinear runs/run00001 "$NEW" \
  --cameras 20 --output /tmp/q12_allangles_ao \
  > /tmp/q12_allangles_ao.log 2>&1
log "v12 s1 allangles AO rc=$?"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2ao --samples 400 \
  --models bilinear runs/run00001 "$NEW" \
  > /tmp/q12_crops_old.log 2>&1
log "v12 s2 crops on mix2ao rc=$?"

wait_up
timeout 14000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix3 --numberOfImages 80 \
  --cacheDataset /tmp/isosr_clips_mix3 \
  --batchSize 8 --remat --dataDtype bfloat16 \
  --samples 2000 --epochs 40 \
  --pretrained "$NEW" \
  --lr 2e-5 --lrStep 30 --gradClip 1.0 --checkpointEvery 10 \
  --advTraining --advDiscrLr 1e-4 \
  --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,perceptual:color:0.02,texture:color:0.002,adv:all:0.3" \
  > /tmp/q12_adv.log 2>&1
log "v12 s3 adv fine-tune rc=$?"
ADV=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
log "v12 s3 adv run: $ADV"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3 --samples 400 \
  --models bilinear "$NEW" "$ADV" \
  > /tmp/q12_crops_adv.log 2>&1
log "v12 s4 adv crops rc=$?"

wait_up
timeout 1800 python bench.py > /tmp/q12_bench.log 2>&1
log "v12 s5 bench rc=$? $(tail -1 /tmp/q12_bench.log | head -c 200)"

log "=== QUEUE v12 DONE $(date -u) ==="

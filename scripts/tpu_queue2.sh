#!/bin/bash
# Round-2 TPU work queue v2 — supersedes scripts/tpu_queue.sh.
#
# v2 exists because the round-2 AO investigation found the baked-AO
# training target was near-constant 1.0 (bake sampling started at
# radius/2 + data-gen radius of 1.0 world — see render/ao_sweep.py).
# Both clip caches therefore carry a junk AO channel; the quality stages
# must REGENERATE the caches with the fixed bake before fine-tuning.
#
# Queue (serial — two concurrent TPU clients wedge the tunnel helper):
#   1. regen mix2 cache (fixed AO) + AO fine-tune from run00009
#   2. eval: bilinear/bicubic/run00009/new run on the new cache
#   3. regen 512^3 cache + training demo
#   4. bench_volumes 256,512
#   5. bench_volumes 1024 (needs /tmp/blobs1024_u8.npz pre-generated)
#   6. headline bench.py
#   7. stage-2 adversarial fine-tune from the new best + eval
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

log "=== queue v2 start $(date -u) ==="

wait_up
timeout 16000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix2 --numberOfImages 64 \
  --cacheDataset /tmp/isosr_clips_mix2ao \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 --epochs 60 \
  --pretrained runs/run00009 --lr 5e-5 --lrStep 25 --gradClip 1.0 \
  --checkpointEvery 10 \
  --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1" \
  > /tmp/q2_aotune.log 2>&1
log "stage1 AO-cache regen + fine-tune rc=$?"
NEW=$(ls -d runs/run00* | sort | tail -1)
log "stage1 newest run: $NEW"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2ao --samples 400 \
  --models nearest bilinear bicubic runs/run00009 "$NEW" \
  > /tmp/q2_eval.log 2>&1
log "stage2 eval rc=$?"

wait_up
EPOCHS=15 timeout 12000 bash scripts/train_512.sh \
  --cacheDataset /tmp/isosr_clips_512ao > /tmp/q2_train512.log 2>&1
log "stage3 train512 rc=$?"

wait_up
timeout 3600 python scripts/bench_volumes.py --res 256,512 \
  > /tmp/q2_vol512.log 2>&1
log "stage4 bench 256/512 rc=$?"

wait_up
timeout 5400 python scripts/bench_volumes.py --res 1024 \
  > /tmp/q2_vol1024.log 2>&1
log "stage5 bench 1024 rc=$?"

wait_up
timeout 1800 python bench.py > /tmp/q2_bench.log 2>&1
log "stage6 bench rc=$?"

wait_up
BASE=${NEW:-runs/run00009}
timeout 12000 bash scripts/train_adv.sh "$BASE" 30 > /tmp/q2_adv.log 2>&1
log "stage7 adv from $BASE rc=$?"
ADV=$(ls -d runs/run00* | sort | tail -1)

wait_up
timeout 2400 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2ao --samples 400 \
  --models bilinear "$ADV" > /tmp/q2_eval_adv.log 2>&1
log "stage8 eval adv rc=$?"

log "=== QUEUE v2 DONE $(date -u) ==="

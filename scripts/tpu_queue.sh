#!/bin/bash
# Round-2 TPU work queue — runs the remaining on-chip work serially once
# the tunnel returns.  One TPU client at a time (two concurrent clients
# wedge the tunnel's compile helper — measured round 2).  Stages log to
# /tmp/q_*.log; progress lines append to /tmp/tpu_queue.status.
#
# Queue (from the round-2 outage backlog):
#   1. eval run00008 (stage-2 adversarial) on the crops protocol
#   2. bench_volumes 256+512 (uint8 caches pre-generated)
#   3. ao/mask rebalance fine-tune from run00009 (ao 14, mask 8)
#   4. eval the rebalanced run vs interpolation baselines
#   5. 512^3 RAW training demo (clips cached at /tmp/isosr_clips_512)
#   6. bench_volumes 1024
#   7. headline bench.py re-check
#   8. stage-2 adversarial fine-tune from the best stage-1 run + eval
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

log "=== queue start $(date -u) ==="
wait_up

wait_up
timeout 2400 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2 --samples 400 \
  --models bilinear runs/run00008 > /tmp/q_eval8.log 2>&1
log "stage1 eval run00008 rc=$?"

wait_up
timeout 3600 python scripts/bench_volumes.py --res 256,512 \
  > /tmp/q_vol512.log 2>&1
log "stage2 bench 256/512 rc=$?"

wait_up
timeout 9000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix2 --numberOfImages 64 \
  --cacheDataset /tmp/isosr_clips_mix2 \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 --epochs 40 \
  --pretrained runs/run00009 --lr 2.5e-5 --lrStep 15 --gradClip 1.0 \
  --checkpointEvery 5 \
  --losses "l1:mask:8,l1:ao:14,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1" \
  > /tmp/q_rebal.log 2>&1
log "stage3 rebalance rc=$?"
NEW=$(ls -d runs/run00* | sort | tail -1)
log "stage3 newest run: $NEW"

wait_up
timeout 2400 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2 --samples 400 \
  --models bilinear bicubic runs/run00009 "$NEW" > /tmp/q_eval_rebal.log 2>&1
log "stage4 eval rebalance rc=$?"

wait_up
EPOCHS=15 timeout 12000 bash scripts/train_512.sh > /tmp/q_train512.log 2>&1
log "stage5 train512 rc=$?"

wait_up
timeout 5400 python scripts/bench_volumes.py --res 1024 \
  > /tmp/q_vol1024.log 2>&1
log "stage6 bench 1024 rc=$?"

wait_up
timeout 1800 python bench.py > /tmp/q_bench.log 2>&1
log "stage7 bench rc=$?"

# stage 8: adversarial stage-2 from the rebalanced net (falls back to
# run00009 if stage 3 produced nothing newer)
wait_up
BASE=${NEW:-runs/run00009}
timeout 9000 bash scripts/train_adv.sh "$BASE" 30 > /tmp/q_adv.log 2>&1
log "stage8 adv from $BASE rc=$?"
ADV=$(ls -d runs/run00* | sort | tail -1)

wait_up
timeout 2400 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2 --samples 400 \
  --models bilinear "$ADV" > /tmp/q_eval_adv.log 2>&1
log "stage9 eval adv rc=$?"

log "=== QUEUE DONE $(date -u) ==="

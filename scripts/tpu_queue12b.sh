#!/bin/bash
# Round-2 TPU work queue v12b — corrected v12.
#
# v12 resolved its $NEW run with `ls runs | tail -1` and caught a junk
# checkpoint-less run dir left behind by a killed verification drive;
# the driver was stopped (its in-flight s1 allangles-AO stage was left
# running) and this corrected queue pins the mix3 net explicitly.
# Stages: wait for s1's python (by PID) -> log its result -> regression
# crops on the old mix2ao cache -> stage-2 adversarial fine-tune from
# run00005 -> crops eval of it -> headline bench refresh.
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

NET=runs/run00005

# wait for the orphaned v12 s1 (allangles AO) to release the chip
S1_PID=$(cat /tmp/q12_s1.pid 2>/dev/null)
if [ -n "$S1_PID" ]; then
  while kill -0 "$S1_PID" 2>/dev/null; do sleep 60; done
fi
log "=== queue v12b start $(date -u) ==="
log "v12b s1 allangles AO (orphan) tail: $(tail -2 /tmp/q12_allangles_ao.log 2>/dev/null | head -c 300)"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2ao --samples 400 \
  --models bilinear runs/run00001 "$NET" \
  > /tmp/q12_crops_old.log 2>&1
log "v12b s2 crops on mix2ao rc=$?"

wait_up
timeout 14000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix3 --numberOfImages 80 \
  --cacheDataset /tmp/isosr_clips_mix3 \
  --batchSize 8 --remat --dataDtype bfloat16 \
  --samples 2000 --epochs 40 \
  --pretrained "$NET" \
  --lr 2e-5 --lrStep 30 --gradClip 1.0 --checkpointEvery 10 \
  --advTraining --advDiscrLr 1e-4 \
  --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,perceptual:color:0.02,texture:color:0.002,adv:all:0.3" \
  > /tmp/q12_adv.log 2>&1
log "v12b s3 adv fine-tune rc=$?"
ADV=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
log "v12b s3 adv run: $ADV"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3 --samples 400 \
  --models bilinear "$NET" "$ADV" \
  > /tmp/q12_crops_adv.log 2>&1
log "v12b s4 adv crops rc=$?"

wait_up
timeout 1800 python bench.py > /tmp/q12_bench.log 2>&1
log "v12b s5 bench rc=$? $(tail -1 /tmp/q12_bench.log | head -c 200)"

log "=== QUEUE v12 DONE $(date -u) ==="

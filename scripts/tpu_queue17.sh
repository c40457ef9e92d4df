#!/bin/bash
# Round-2 TPU work queue v17 — self-contained reconstruction of v15+v16
# after the second host-VM recycle (wiped /tmp + runs/ at ~epoch 50 of
# the v15 close-camera retrain; artifacts/ snapshots survived).
#
# s1  close-camera warm retrain of artifacts/run00005 on mix3 with
#     --cameraDistance 0.6,1.3 (the diag_iface_stats3 gap: eval cameras
#     at 0.6-1.0 distance, every training zoo at 0.95-1.3).
# s2  crops eval on the close-camera cache.
# s3  regen the original-distance mix3 cache (throwaway 1-epoch run).
# s4  crops regression check on the original cache.
# s5  paper-stats on turbulence/ejecta/interface (the v15 goal metric:
#     does close-camera training fix interface normals?).
# s6/s7  all-angles without/with AO.
# s8  skull/thorax paper-stats (five-dataset coverage, v16 s1).
# s9  stage-2 adversarial+perceptual fine-tune from the v15 net (v16 s2).
# s10 crops eval of the adversarial net vs its stage-1 parent (v16 s3).
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

log "=== queue v17 start $(date -u) ==="

NET=artifacts/run00005

wait_up
timeout 16000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix3 --numberOfImages 80 \
  --cameraDistance 0.6,1.3 \
  --cacheDataset /tmp/isosr_clips_mix3cd \
  --pretrained "$NET" \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 --epochs 100 \
  --lr 1e-4 --lrStep 40 --gradClip 1.0 --checkpointEvery 20 \
  --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1" \
  > /tmp/q17_train.log 2>&1
log "v17 s1 close-camera retrain rc=$?"
NEW=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
if [ ! -f "$NEW/config.json" ]; then
  log "v17 s1 FAILED: $NEW has no config.json; aborting queue"
  log "=== QUEUE v17 DONE $(date -u) ==="
  exit 1
fi
log "v17 s1 new run: $NEW"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3cd --samples 400 \
  --models bilinear bicubic "$NET" "$NEW" \
  > /tmp/q17_crops.log 2>&1
log "v17 s2 crops (close-camera cache) rc=$?"

wait_up
timeout 9000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix3 --numberOfImages 80 \
  --cacheDataset /tmp/isosr_clips_mix3 \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1 \
  > /tmp/q17_regen.log 2>&1
log "v17 s3 original mix3 cache regen rc=$?"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3 --samples 400 \
  --models bilinear "$NET" "$NEW" \
  > /tmp/q17_crops_old.log 2>&1
log "v17 s4 crops (original mix3 cache, regression check) rc=$?"

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:turbulence:256 analytic:ejecta:256 \
            analytic:interface:256 \
  --models bilinear bicubic "$NET" "$NEW" \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q17_stats > /tmp/q17_stats.log 2>&1
log "v17 s5 psnr_stats rc=$?"

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --lowRes 128 \
  --models bilinear "$NET" "$NEW" \
  --cameras 20 --output /tmp/q17_allangles \
  > /tmp/q17_allangles.log 2>&1
log "v17 s6 allangles noAO rc=$?"

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --lowRes 128 \
  --aoSamples 128 \
  --models bilinear "$NET" "$NEW" \
  --cameras 20 --output /tmp/q17_allangles_ao \
  > /tmp/q17_allangles_ao.log 2>&1
log "v17 s7 allangles AO rc=$?"

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:skull:256 analytic:thorax:256 \
  --models bilinear bicubic "$NET" "$NEW" \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q17_stats2 > /tmp/q17_stats2.log 2>&1
log "v17 s8 skull/thorax psnr_stats rc=$?"

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
  > /tmp/q17_adv.log 2>&1
log "v17 s9 adversarial fine-tune rc=$?"
ADV=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
if [ "$ADV" = "$NEW" ] || [ ! -f "$ADV/config.json" ]; then
  log "v17 s9 FAILED: no new run after $NEW; skipping s10"
  log "=== QUEUE v17 DONE $(date -u) ==="
  exit 1
fi
log "v17 s9 adversarial run: $ADV"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3cd --samples 400 \
  --models bilinear "$NEW" "$ADV" \
  > /tmp/q17_crops_adv.log 2>&1
log "v17 s10 crops (adv vs stage-1b parent) rc=$?"

log "=== QUEUE v17 DONE $(date -u) ==="

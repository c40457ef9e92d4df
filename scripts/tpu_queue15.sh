#!/bin/bash
# Round-2 TPU work queue v15 — reconstruction of v14 after the host VM
# recycle wiped /tmp and runs/ (v14 never ran; the v13-DONE sentinel it
# waited on was lost with /tmp).
#
# Goal (diag_iface_stats3, 2026-08-19): close the eval/train
# camera-distance gap.  On the interface slab the net's normal PSNR
# tracks GT screen-space normal roughness, which grows as cameras graze
# the slab; eval harnesses render cameras at the reference's 0.6-1.0
# distance where the slab fills the frame, but every training zoo
# rendered at 0.95-1.3 — the net never saw full-frame grazing smooth
# surfaces.  s1 warm-retrains run00005 (from the committed artifacts/
# snapshot) on the mix3 zoo with --cameraDistance 0.6,1.3, then re-runs
# the quality harnesses, including the all-angles AO eval orphaned by
# v12.
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

log "=== queue v15 start $(date -u) ==="

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
  > /tmp/q15_train.log 2>&1
log "v15 s1 close-camera retrain rc=$?"
NEW=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
if [ ! -f "$NEW/config.json" ]; then
  log "v15 s1 FAILED: $NEW has no config.json; aborting queue"
  log "=== QUEUE v15 DONE $(date -u) ==="
  exit 1
fi
log "v15 s1 new run: $NEW"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3cd --samples 400 \
  --models bilinear bicubic "$NET" "$NEW" \
  > /tmp/q15_crops.log 2>&1
log "v15 s2 crops (close-camera cache) rc=$?"

# Regenerate the original-camera-distance mix3 cache (wiped with /tmp)
# via a 1-epoch throwaway trainer run, for the regression check.
wait_up
timeout 9000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix3 --numberOfImages 80 \
  --cacheDataset /tmp/isosr_clips_mix3 \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1 \
  > /tmp/q15_regen.log 2>&1
log "v15 s3 original mix3 cache regen rc=$?"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3 --samples 400 \
  --models bilinear "$NET" "$NEW" \
  > /tmp/q15_crops_old.log 2>&1
log "v15 s4 crops (original mix3 cache, regression check) rc=$?"

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:turbulence:256 analytic:ejecta:256 \
            analytic:interface:256 \
  --models bilinear bicubic "$NET" "$NEW" \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q15_stats > /tmp/q15_stats.log 2>&1
log "v15 s5 psnr_stats rc=$?"

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --lowRes 128 \
  --models bilinear "$NET" "$NEW" \
  --cameras 20 --output /tmp/q15_allangles \
  > /tmp/q15_allangles.log 2>&1
log "v15 s6 allangles noAO rc=$?"

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --lowRes 128 \
  --aoSamples 128 \
  --models bilinear "$NET" "$NEW" \
  --cameras 20 --output /tmp/q15_allangles_ao \
  > /tmp/q15_allangles_ao.log 2>&1
log "v15 s7 allangles AO (redo of orphaned v12 s1) rc=$?"

log "=== QUEUE v15 DONE $(date -u) ==="

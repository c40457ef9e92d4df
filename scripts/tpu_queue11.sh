#!/bin/bash
# Round-2 TPU work queue v11 — retrain on the band-limited volume zoo.
#
# The band-limit fix (analytic.py min_feature_voxels) made the
# turbulence/interface GT resolvable and exposed that the speckle-trained
# run00001 ADDS spurious normal detail on smooth surfaces (interface
# normals 26 dB vs bilinear 33 dB).  Warm-start retrain on mix3
# (mix2 + 2 extra interface seeds + one smoother turbulence), then
# re-run every quality harness against the new net.
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

until grep -q "QUEUE v10 DONE" "$S" 2>/dev/null; do sleep 60; done

log "=== queue v11 start $(date -u) ==="

wait_up
timeout 20000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix3 --numberOfImages 80 \
  --cacheDataset /tmp/isosr_clips_mix3 \
  --pretrained runs/run00001 \
  --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 --epochs 150 \
  --lr 1e-4 --lrStep 60 --gradClip 1.0 --checkpointEvery 20 \
  --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1" \
  > /tmp/q11_train.log 2>&1
log "v11 s1 mix3 warm retrain rc=$?"
NEW=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
log "v11 s1 new run: $NEW"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3 --samples 400 \
  --models nearest bilinear bicubic runs/run00001 "$NEW" \
  > /tmp/q11_crops.log 2>&1
log "v11 s2 crops rc=$?"

wait_up
timeout 10800 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:turbulence:256 analytic:ejecta:256 \
            analytic:interface:256 \
  --models nearest bilinear bicubic runs/run00001 "$NEW" \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q11_stats > /tmp/q11_stats.log 2>&1
log "v11 s3 psnr_stats rc=$?"

wait_up
timeout 7200 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --lowRes 128 \
  --models bilinear "$NEW" \
  --cameras 20 --output /tmp/q11_allangles \
  > /tmp/q11_allangles.log 2>&1
log "v11 s4 allangles rc=$?"

log "=== QUEUE v11 DONE $(date -u) ==="

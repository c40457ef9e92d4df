#!/bin/bash
# Round-2 TPU work queue v20 — final-evaluation pass after the v19 GDL
# retrain.  Serializes behind v19 (single-client TPU tunnel), picks the
# newest completed run (the GDL net if v19 s1 succeeded, else the
# close-camera parent), then:
#
# s1  full paper-stats table over all five reference-dataset analogues
#     (turbulence/ejecta/interface/skull/thorax) for the final README
#     quality table: bilinear + bicubic + stage-1b (run00005) + best.
# s2  400-crop eval on the far-distance mix3 cache (regenerated if the
#     recycle wiped it) — the regression check that the close/GDL nets
#     didn't trade away the resolvable-surface wins.
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
wait_up() {
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}

until grep -q "QUEUE v19 DONE" "$S" 2>/dev/null; do sleep 120; done
log "=== queue v20 start $(date -u) ==="

BEST=$(ls -d runs/run00* 2>/dev/null | sort | tail -1)
if [ ! -f "$BEST/params.npz" ]; then BEST=artifacts/run00007; fi
log "v20 best net: $BEST"

wait_up
timeout 14400 python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
  --volumes analytic:turbulence:256 analytic:ejecta:256 \
            analytic:interface:256 analytic:skull:256 analytic:thorax:256 \
  --models bilinear bicubic artifacts/run00005 "$BEST" \
  --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
  --output /tmp/q20_stats > /tmp/q20_stats.log 2>&1
log "v20 s1 five-analogue psnr_stats rc=$?"
mkdir -p artifacts/quality && cp -r /tmp/q20_stats artifacts/quality/ 2>/dev/null

wait_up
# Far-distance regression: regenerate the original mix3 cache if absent
# (throwaway 1-epoch run, the v17 s3 pattern), then crops eval.
if [ ! -f /tmp/isosr_clips_mix3/low_00000.npy ]; then
  timeout 9000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix3 --numberOfImages 80 \
    --cacheDataset /tmp/isosr_clips_mix3 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1 \
    > /tmp/q20_regen.log 2>&1
  log "v20 s2a far-cache regen rc=$?"
fi
wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix3 --samples 400 \
  --models bilinear artifacts/run00005 artifacts/run00007 "$BEST" \
  > /tmp/q20_crops.log 2>&1
log "v20 s2 far-cache crops regression rc=$?"

log "=== QUEUE v20 DONE $(date -u) ==="

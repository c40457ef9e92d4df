#!/bin/bash
# Round-2 TPU work queue v5 — supersedes v3/v4 after their NEW-run
# detection picked a checkpoint-less smoke dir (run00002/3, since
# deleted).  v3's stage-1 200-epoch retrain on fixed-AO targets is DONE
# (runs/run00001, test PSNR 24.21 dB); v5 runs everything downstream
# with the stage-1 run pinned explicitly:
#   1. eval nearest/bilinear/bicubic/run00001 on the mix2ao cache
#   2. 512^3 RAW-import training demo (tiled uint8 Pallas sweep)
#   3. bench_volumes 256,512 dense
#   4. bench_volumes 1024 dense
#   5. headline bench.py + bench.py --int8
#   6. adversarial fine-tune from run00001 + eval of the new run
#   7. int8-vs-f32 quality A/B on run00001
#   8. bench_volumes 512 dense+AO (tiled second pass)
#   9. bench_volumes 512,1024 sparse (packed tile atlas)
#  10. bench_volumes 512 sparse+AO
#  11. all-angles PSNR harness on run00001 (mainPSNR2 parity)
#  12. timings.csv comparison harness on run00001 (mainComparison parity)
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

STAGE1=runs/run00001
log "=== queue v5 start $(date -u) === stage1=$STAGE1"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
  --dataset /tmp/isosr_clips_mix2ao --samples 400 \
  --models nearest bilinear bicubic "$STAGE1" \
  > /tmp/q5_eval.log 2>&1
log "v5 s1 eval rc=$?"

wait_up
EPOCHS=15 timeout 14000 bash scripts/train_512.sh > /tmp/q5_train512.log 2>&1
log "v5 s2 train512 rc=$?"

wait_up
timeout 3600 python scripts/bench_volumes.py --res 256,512 \
  > /tmp/q5_vol512.log 2>&1
log "v5 s3 bench 256/512 rc=$?"

wait_up
timeout 5400 python scripts/bench_volumes.py --res 1024 \
  > /tmp/q5_vol1024.log 2>&1
log "v5 s4 bench 1024 rc=$?"

wait_up
timeout 1800 python bench.py > /tmp/q5_bench.log 2>&1
log "v5 s5 bench rc=$? $(tail -1 /tmp/q5_bench.log | head -c 200)"
wait_up
timeout 1800 python bench.py --int8 --no-ao > /tmp/q5_bench_int8.log 2>&1
log "v5 s5b int8 bench rc=$? $(tail -1 /tmp/q5_bench_int8.log | head -c 200)"

wait_up
timeout 12000 bash scripts/train_adv.sh "$STAGE1" 30 > /tmp/q5_adv.log 2>&1
log "v5 s6 adv from $STAGE1 rc=$?"
# newest run dir that actually has checkpoints
ADV=""
for d in $(ls -d runs/run00* 2>/dev/null | sort -r); do
  if [ -n "$(ls "$d/checkpoints" 2>/dev/null)" ] && [ "$d" != "$STAGE1" ]; then
    ADV="$d"; break
  fi
done
log "v5 s6 adv run: ${ADV:-none}"
if [ -n "$ADV" ]; then
  wait_up
  timeout 2400 python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix2ao --samples 400 \
    --models bilinear "$ADV" > /tmp/q5_eval_adv.log 2>&1
  log "v5 s6b eval adv ($ADV) rc=$?"
fi

wait_up
timeout 2400 python scripts/eval_int8.py \
  --dataset /tmp/isosr_clips_mix2ao --run "$STAGE1" --samples 400 \
  > /tmp/q5_int8_eval.log 2>&1
log "v5 s7 int8 eval rc=$?"

wait_up
timeout 3600 python scripts/bench_volumes.py --res 512 --ao \
  > /tmp/q5_vol512_ao.log 2>&1
log "v5 s8 bench 512 +ao rc=$?"

wait_up
timeout 5400 python scripts/bench_volumes.py --res 512,1024 --sparse \
  > /tmp/q5_vol_sparse.log 2>&1
log "v5 s9 bench 512/1024 sparse rc=$?"

wait_up
timeout 3600 python scripts/bench_volumes.py --res 512 --sparse --ao \
  > /tmp/q5_vol512_sparse_ao.log 2>&1
log "v5 s10 bench 512 sparse+ao rc=$?"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
  --volume analytic:blobs --isovalue 0.36 --models bilinear "$STAGE1" \
  --cameras 20 --output /tmp/q5_allangles \
  > /tmp/q5_allangles.log 2>&1
log "v5 s11 allangles rc=$?"

wait_up
timeout 3600 python -m isosurfacesuperresolution_tpu.apps.main_comparison \
  --volume analytic:blobs --isovalue 0.36 --models bilinear "$STAGE1" \
  --output /tmp/q5_timings \
  > /tmp/q5_comparison.log 2>&1
log "v5 s12 timings.csv rc=$?"

log "=== QUEUE v5 DONE $(date -u) ==="

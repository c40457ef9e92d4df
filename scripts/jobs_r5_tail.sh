# Round-5 tail - gated on jobs_r5_eval.sh.  VERDICT r4 items 5, 8 +
# round-4 ADVICE item 4 (on-chip phase-kernel parity):
#
# c0  blocked-phase-kernel numerical parity on the REAL Mosaic lowering
#     (the unit tests run it in interpret mode only)
# c1/c2  width-sweep SPEED half: the fused frame at 48- and 32-feature
#     trunks (random init - frame cost is width-, not weight-dependent)
# c3  width-sweep QUALITY half: 48-feature net trained to the champion
#     recipe for 60 epochs on the champion's cache
# c4  crops eval of the width-48 net vs the champion + interps
# c5  champion schedule extension (--restore run00014 into a third lr
#     step) until round-end preemption; checkpoints survive via
#     artifact_watch

until grep -q "QUEUE jobs_r5_eval.sh DONE" "$S" 2>/dev/null; do
  alive=0
  for f in /tmp/queue_*.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f" 2>/dev/null)
    [ "$p" = "$$" ] && continue
    kill -0 "$p" 2>/dev/null && alive=1
  done
  if [ "$alive" = 0 ]; then
    log "r5tail: eval driver gone without DONE marker; proceeding"
    break
  fi
  sleep 60
done
log "r5tail: gate passed"

run_stage c0_phase_parity 1200 /tmp/r5_phase_parity.log -- \
  python scripts/profile_phase_blocked.py --parity-only

run_stage c1_width48_speed 1800 /tmp/r5_width48_speed.log -- \
  python bench.py --features 48 --no-ao --no-preempt

run_stage c2_width32_speed 1800 /tmp/r5_width32_speed.log -- \
  python bench.py --features 32 --no-ao --no-preempt

PRE=$(newest_run)
run_stage c3_width48_train 6000 /tmp/r5_width48_train.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --numFeatures 48 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 60 --lr 1e-4 --lrStep 30 --gradClip 1.0 \
    --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
W48=$(expect_new_run "$PRE") || W48=""
if [ -n "$W48" ]; then
  log "c3: width-48 net $W48"
  echo "$W48" > /tmp/r5_w48_run
  run_stage c4_width48_crops 2400 /tmp/r5_width48_crops.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
      --dataset /tmp/isosr_clips_mix4cd --samples 400 \
      --models bilinear runs/run00014 "$W48"
else
  log "c3: no complete width-48 run"
fi

run_stage c5_champion_extend 14400 /tmp/r5_champ_extend.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --restore runs/run00014 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 220 --lr 5e-5 --lrStep 60 --gradClip 1.0 \
    --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"

# Round-4 tail v3 (replaces tail2): after the eval3 pipeline,
# 1) retry the 1024^3+AO measurement with the uint8-quantized field +
#    factor-2 fast host upsample (the bf16 field's transpose copy OOM'd
#    the render compile in h0; see render/ao_sweep.py, grid.ao_scale),
# 2) adversarial fine-tune of the champion until round-end preemption.

until grep -q "QUEUE jobs_r4_eval3.sh DONE" "$S" 2>/dev/null; do
  alive=0
  for f in /tmp/queue_*.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f" 2>/dev/null)
    [ "$p" = "$$" ] && continue
    kill -0 "$p" 2>/dev/null && alive=1
  done
  if [ "$alive" = 0 ]; then
    log "tail3: eval3 driver gone without DONE marker; proceeding"
    break
  fi
  sleep 60
done
log "tail3: gate passed"

run_stage r1_ao_retry_1024 2700 /tmp/r4_perf_ao1024c.log -- \
  python scripts/bench_volumes.py --res 1024 --frames 10 --ao

CHAMP=$(cat /tmp/r4_champion 2>/dev/null)
[ -z "$CHAMP" ] && CHAMP=runs/run00012
run_stage t2_adv_finetune 5400 /tmp/r4_adv_finetune.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --pretrained "$CHAMP" \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 60 --lr 2e-5 --lrStep 30 --gradClip 1.0 \
    --checkpointEvery 5 --advTraining \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2,adv:all:0.3"

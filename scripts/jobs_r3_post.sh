# Round-3 post pipeline: reacts to the f1 crops finding that run00007
# (the round-2 close-band net) beats interpolation on ALL SIX channels
# of the full-band cache - making it the primary one-net candidate -
# while run00012's lr-1e-4 GDL training over-smoothed normals.
#
# p1  supplementary five-analogue stats for run00007 (the f3 stages were
#     already running with a fixed model list; same seed/protocol, so the
#     rows are directly comparable with artifacts/quality/r3_stats/).
# p2  corrective consolidation retrain: warm from run00007, the cached
#     full-band mix4 zoo, GDL reduced to 2/2, lr 5e-5 (the run00010
#     recipe that preserved normals) - banked for round 4; checkpoint-
#     safe under the round-end preemption.

until grep -q "QUEUE jobs_r3_final.sh DONE" "$S" 2>/dev/null; do
  alive=0
  for f in /tmp/queue_*.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f" 2>/dev/null)
    [ "$p" = "$$" ] && continue
    kill -0 "$p" 2>/dev/null && alive=1
  done
  if [ "$alive" = 0 ]; then
    log "post: final driver gone without DONE marker; proceeding"
    break
  fi
  sleep 60
done
log "post: gate passed"

for vol in interface turbulence ejecta skull thorax; do
  run_stage "p1_stats7_$vol" 2700 "/tmp/r3_stats7_$vol.log" -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes "analytic:$vol:256" \
      --models artifacts/run00007 \
      --numSequences 3 --numFrames 10 --highRes 256 --aoSamples 64 \
      --output /tmp/r3_stats7
  mkdir -p artifacts/quality/r3_stats7 \
    && cp /tmp/r3_stats7/*.tsv artifacts/quality/r3_stats7/ 2>/dev/null
done

run_stage p2_retrain 14400 /tmp/r3_retrain.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --pretrained artifacts/run00007 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 300 --lr 5e-5 --lrStep 100 --gradClip 1.0 \
    --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"

# Round-5 eval pipeline - gated on jobs_r5_main.sh (adv16 eval + GDL
# fine-tune + 10-frame champion stats).  VERDICT r4 items 4, 1, 2, 3, 7.
#
# b0  1024^3+AO with the half-res native-coarse capture (item 4): the
#     uint8 field stays at 512^3 per axis and the tiled pass-2 kernel
#     samples it directly - quarter the DMA+matmul work of the r4
#     full-res-field capture that measured 15.4 FPS.
# b1/b2  crops protocol, both bands, champion + GDL fine-tune
# b3  five-analogue stats at the 6-frame protocol for the same four
#     nets - produces per-sequence npz for PAIRED verdicts (item 2)
# b4  stabilized adversarial fine-tune of the champion (item 3):
#     adv:all:0.1 (was 0.3 - run00016 diverged), gen lr 1e-5,
#     discr lr 5e-5 (the diverging run gave the discriminator 5x the
#     generator lr AND 3x the adv weight)
# b5  adversarial evidence for the new adv net vs its parents
# b6  extend the 512^3 fine-tune to saturation (item 7; run00015
#     stopped at epoch 30 with the loss still descending)
# b7  512-volume stats row refresh with the extended net

until grep -q "QUEUE jobs_r5_main.sh DONE" "$S" 2>/dev/null; do
  alive=0
  for f in /tmp/queue_*.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f" 2>/dev/null)
    [ "$p" = "$$" ] && continue
    kill -0 "$p" 2>/dev/null && alive=1
  done
  if [ "$alive" = 0 ]; then
    log "r5eval: main driver gone without DONE marker; proceeding"
    break
  fi
  sleep 60
done
log "r5eval: gate passed"

GDL=$(cat /tmp/r5_gdl_run 2>/dev/null)
if [ -z "$GDL" ]; then
  log "r5eval: NO GDL fine-tune run; evaluating champion only"
  GDL=""
fi

# learned texture-feature encoder (VERDICT item 9): minutes on-chip,
# and every adv_evidence run after this stage gains the TexGramLearned
# column from the committed weights
run_stage b00_texenc 1500 /tmp/r5_texenc.log -- \
  python -m isosurfacesuperresolution_tpu.apps.train_texenc \
    --dataset /tmp/isosr_clips_mix4cd --cropSize 32 --samples 800 \
    --steps 2000 --batchSize 32 --output artifacts/texenc/texenc.npz

run_stage b0_ao_1024_halfres 2700 /tmp/r5_perf_ao1024.log -- \
  python scripts/bench_volumes.py --res 1024 --frames 10 --ao

run_stage b1_crops_fullband 2400 /tmp/r5_crops_full.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix4cd --samples 400 \
    --models bilinear bicubic runs/run00014 $GDL

run_stage b2_crops_far 2400 /tmp/r5_crops_far.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix3far --samples 400 \
    --models bilinear bicubic runs/run00014 $GDL

run_stage b3_stats_all5 10800 /tmp/r5_stats6f.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
    --volumes analytic:turbulence:256 analytic:ejecta:256 \
              analytic:interface:256 analytic:skull:256 \
              analytic:thorax:256 \
    --models bilinear bicubic runs/run00014 $GDL \
    --numSequences 10 --numFrames 6 --highRes 256 --aoSamples 64 \
    --output /tmp/r5_stats6f
mkdir -p artifacts/quality/r5_stats6f \
  && cp /tmp/r5_stats6f/*.tsv /tmp/r5_stats6f/*.npz \
       artifacts/quality/r5_stats6f/ 2>/dev/null

PRE=$(newest_run)
run_stage b4_adv_stable 5400 /tmp/r5_adv_stable.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --pretrained runs/run00014 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 40 --lr 1e-5 --lrStep 20 --gradClip 1.0 \
    --checkpointEvery 5 --advTraining --advDiscrLr 5e-5 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2,adv:all:0.1"
ADV=$(expect_new_run "$PRE") || ADV=""
if [ -n "$ADV" ]; then
  log "b4: stabilized adv run $ADV"
  echo "$ADV" > /tmp/r5_adv_run
  run_stage b5_adv_evidence 2400 /tmp/r5_adv_evidence.log -- \
    python -m isosurfacesuperresolution_tpu.apps.adv_evidence \
      --dataset /tmp/isosr_clips_mix4cd --samples 400 \
      --models bilinear runs/run00014 runs/run00016 "$ADV" \
      --output artifacts/quality/adv_evidence_r5
else
  log "b4: no complete adv run"
fi

PRE512=$(newest_run)
run_stage b6_train512_extend 5400 /tmp/r5_train512.log -- \
  env EPOCHS=100 bash scripts/train_512.sh \
    --restore runs/run00015 --lr 5e-5 --lrStep 15 --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
NEW512=$(expect_new_run "$PRE512") || NEW512=""
if [ -n "$NEW512" ]; then
  log "b6: extended 512 net $NEW512"
  echo "$NEW512" > /tmp/r5_512_run
  run_stage b7_stats512 2400 /tmp/r5_stats512.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes /tmp/isosr_vol512/ejecta512.dat \
      --models bilinear runs/run00014 runs/run00015 "$NEW512" \
      --numSequences 5 --numFrames 6 --highRes 256 --aoSamples 64 \
      --isovalue 0.4 --output /tmp/r5_stats512
  mkdir -p artifacts/quality/r5_stats512 \
    && cp /tmp/r5_stats512/*.tsv /tmp/r5_stats512/*.npz \
         artifacts/quality/r5_stats512/ 2>/dev/null
else
  log "b6: no complete extended 512 run"
fi

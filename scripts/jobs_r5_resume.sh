# Round-5 RESUME pipeline — the VM recycled at 08:26 UTC mid
# b0_ao_1024_halfres, wiping /tmp (clip caches, volume caches, stage
# logs) and the gitignored runs/ (restored from artifacts/ snapshots
# before this driver starts).  Completed before the recycle: a1 (adv
# eval of run00016 — loses to parent), a2 (per-channel GDL fine-tune →
# runs/run00017), a3 (champion 10-frame stats), b00 (texenc).
#
# This file chains EVERY remaining r5 stage in judge-value order so a
# round-end preemption cuts from the least valuable tail:
#
#   d1  regen mix4cd clip cache (epochs-1 trainer pass)
#   d2  crops full-band: run00017 vs champion vs interps   (VERDICT 1)
#   d3  regen mix3far clip cache
#   d4  crops far-band: the last interpolation-beats-net cell (VERDICT 1)
#   d5  1024^3+AO with the half-res capture                (VERDICT 4)
#   d0  blocked-phase-kernel on-chip parity                (ADVICE r4 #4)
#   d6  five-analogue 6-frame stats incl. run00017 → paired (VERDICT 1+2)
#   d7  stabilized adversarial fine-tune (adv 0.1, TTUR)   (VERDICT 3)
#   d8  adv evidence for the new adv net (+ learned texenc column)
#   d9/d10  width-sweep SPEED half (48/32-feature fused frame) (VERDICT 5)
#   d11 width-48 net trained to champion recipe, 60 epochs (VERDICT 5)
#   d12 crops eval of the width-48 net
#   d13 512^3 fine-tune extension to saturation            (VERDICT 7)
#   d14 512-volume stats refresh
#   d15 champion schedule extension until round-end preempt (VERDICT 8)

run_stage d1_regen_mix4cd 3600 /tmp/r5_regen_mix4cd.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1
# drop the cache-regen throwaway run dir so artifact_watch never banks it
LATEST=$(newest_run)
if [ -n "$LATEST" ] && [ ! -f "$LATEST/params.npz" ]; then rm -rf "$LATEST"; fi

run_stage d2_crops_fullband 2400 /tmp/r5_crops_full.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix4cd --samples 400 \
    --models bilinear bicubic runs/run00014 runs/run00017

run_stage d3_regen_mix3far 2400 /tmp/r5_regen_mix3far.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix3 --numberOfImages 48 \
    --cacheDataset /tmp/isosr_clips_mix3far \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1
LATEST=$(newest_run)
if [ -n "$LATEST" ] && [ ! -f "$LATEST/params.npz" ]; then rm -rf "$LATEST"; fi

run_stage d4_crops_far 2400 /tmp/r5_crops_far.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix3far --samples 400 \
    --models bilinear bicubic runs/run00014 runs/run00017

run_stage d5_ao_1024_halfres 2700 /tmp/r5_perf_ao1024.log -- \
  python scripts/bench_volumes.py --res 1024 --frames 10 --ao

run_stage d0_phase_parity 1200 /tmp/r5_phase_parity.log -- \
  python scripts/profile_phase_blocked.py --parity-only

run_stage d6_stats_all5 10800 /tmp/r5_stats6f.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
    --volumes analytic:turbulence:256 analytic:ejecta:256 \
              analytic:interface:256 analytic:skull:256 \
              analytic:thorax:256 \
    --models bilinear bicubic runs/run00014 runs/run00017 \
    --numSequences 10 --numFrames 6 --highRes 256 --aoSamples 64 \
    --output /tmp/r5_stats6f
mkdir -p artifacts/quality/r5_stats6f \
  && cp /tmp/r5_stats6f/*.tsv /tmp/r5_stats6f/*.npz \
       artifacts/quality/r5_stats6f/ 2>/dev/null

PRE=$(newest_run)
run_stage d7_adv_stable 5400 /tmp/r5_adv_stable.log -- \
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
  log "d7: stabilized adv run $ADV"
  echo "$ADV" > /tmp/r5_adv_run
  run_stage d8_adv_evidence 2400 /tmp/r5_adv_evidence.log -- \
    python -m isosurfacesuperresolution_tpu.apps.adv_evidence \
      --dataset /tmp/isosr_clips_mix4cd --samples 400 \
      --models bilinear runs/run00014 runs/run00016 "$ADV" \
      --output artifacts/quality/adv_evidence_r5
else
  log "d7: no complete adv run"
fi

run_stage d9_width48_speed 1800 /tmp/r5_width48_speed.log -- \
  python bench.py --features 48 --no-ao --no-preempt
run_stage d10_width32_speed 1800 /tmp/r5_width32_speed.log -- \
  python bench.py --features 32 --no-ao --no-preempt

PRE=$(newest_run)
run_stage d11_width48_train 6000 /tmp/r5_width48_train.log -- \
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
  log "d11: width-48 net $W48"
  echo "$W48" > /tmp/r5_w48_run
  run_stage d12_width48_crops 2400 /tmp/r5_width48_crops.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
      --dataset /tmp/isosr_clips_mix4cd --samples 400 \
      --models bilinear runs/run00014 "$W48"
else
  log "d11: no complete width-48 run"
fi

PRE512=$(newest_run)
run_stage d13_train512_extend 5400 /tmp/r5_train512.log -- \
  env EPOCHS=100 bash scripts/train_512.sh \
    --restore runs/run00015 --lr 5e-5 --lrStep 15 --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
NEW512=$(expect_new_run "$PRE512") || NEW512=""
if [ -n "$NEW512" ]; then
  log "d13: extended 512 net $NEW512"
  echo "$NEW512" > /tmp/r5_512_run
  run_stage d14_stats512 2400 /tmp/r5_stats512.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes /tmp/isosr_vol512/ejecta512.dat \
      --models bilinear runs/run00014 runs/run00015 "$NEW512" \
      --numSequences 5 --numFrames 6 --highRes 256 --aoSamples 64 \
      --isovalue 0.4 --output /tmp/r5_stats512
  mkdir -p artifacts/quality/r5_stats512 \
    && cp /tmp/r5_stats512/*.tsv /tmp/r5_stats512/*.npz \
         artifacts/quality/r5_stats512/ 2>/dev/null
else
  log "d13: no complete extended 512 run"
fi

# d15: champion schedule extension (VERDICT 8) — runs until round-end
# preemption; checkpoints every 10 epochs survive via artifact_watch
run_stage d15_champion_extend 14400 /tmp/r5_champ_extend.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --pretrained runs/run00014 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 120 --lr 2.5e-5 --lrStep 40 --gradClip 1.0 \
    --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:5,gdl:depth:5"

# Round-5 resume, take 2.  The first resume driver's d1 (mix4cd cache
# regen) hit its 3600s timeout: the 1-core host was split three ways
# (cache regen host pipeline / 1024^3 volume gen / test suite) and the
# 112-sequence render didn't finish.  d2 therefore failed fast, and the
# driver was SIGTERMed during d3 (mix3far regen, whose child survives
# and writes the cache this file's e1 needs).
#
# Changes vs jobs_r5_resume.sh:
#   - every cache-dependent stage is guarded on the cache actually
#     existing (no more failure cascades)
#   - mix4cd regen gets 7200s and runs AFTER the far-band + AO + stats
#     evidence (none of which need it)
#   - e13 champion extension uses the champion's own gdl 2/2 recipe
#     (resume.sh's d15 mistakenly carried r3's 5/5)
#   - 512-extension and champion-extension stages ride last, ordered by
#     VERDICT r4 priority, and absorb round-end preemption
#
# e1  crops far-band: run00017 (per-channel GDL) vs champion/interps/
#     run00005 — THE last interpolation-beats-net cell     (VERDICT 1)
# e3  blocked-phase-kernel on-chip numerical parity        (ADVICE #4)
# e2  1024^3+AO with the native half-res coarse capture    (VERDICT 4)
# e4  five-analogue 6-frame stats incl. run00017, paired   (VERDICT 1+2)
# e5  mix4cd cache regen (7200s, host otherwise idle)
# e6  crops full-band incl. run00017                       (VERDICT 1)
# e7  stabilized adversarial fine-tune (adv 0.1, TTUR)     (VERDICT 3)
# e8  adv evidence: new adv net vs parents + texenc column (VERDICT 3+9)
# e9/e10  width-sweep speed half (48/32 fused frame)       (VERDICT 5)
# e11/e12 width-48 net to champion recipe + crops eval     (VERDICT 5)
# e13/e14 512^3 fine-tune extension + stats refresh        (VERDICT 7)
# e15 champion schedule extension until round-end preempt  (VERDICT 8)

# resume the paused 1024^3 uint8 volume-cache generator (e2's input)
[ -f /tmp/volcache.pid ] && kill -CONT "$(cat /tmp/volcache.pid)" 2>/dev/null

# wait for the surviving d3 child (mix3far regen) to finish writing;
# its pid is recorded by the session that killed the first driver
if [ -f /tmp/r5_d3.pid ]; then
  D3=$(cat /tmp/r5_d3.pid)
  for i in $(seq 1 80); do
    kill -0 "$D3" 2>/dev/null || break
    sleep 30
  done
fi

if [ -f /tmp/isosr_clips_mix3far/low_00000.npy ]; then
  run_stage e1_crops_far 2700 /tmp/r5_crops_far.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
      --dataset /tmp/isosr_clips_mix3far --samples 400 \
      --models bilinear bicubic artifacts/run00005 runs/run00014 \
               runs/run00017
else
  log "e1 skipped: mix3far cache missing"
fi

run_stage e3_phase_parity 1200 /tmp/r5_phase_parity.log -- \
  python scripts/profile_phase_blocked.py --parity-only

run_stage e2_ao_1024_halfres 2700 /tmp/r5_perf_ao1024.log -- \
  python scripts/bench_volumes.py --res 1024 --frames 10 --ao

run_stage e4_stats_all5 10800 /tmp/r5_stats6f.log -- \
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

run_stage e5_regen_mix4cd 7200 /tmp/r5_regen_mix4cd.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1
LATEST=$(newest_run)
if [ -n "$LATEST" ] && [ ! -f "$LATEST/params.npz" ]; then rm -rf "$LATEST"; fi

if [ -f /tmp/isosr_clips_mix4cd/low_00000.npy ]; then
  run_stage e6_crops_fullband 2400 /tmp/r5_crops_full.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
      --dataset /tmp/isosr_clips_mix4cd --samples 400 \
      --models bilinear bicubic runs/run00014 runs/run00017

  PRE=$(newest_run)
  run_stage e7_adv_stable 5400 /tmp/r5_adv_stable.log -- \
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
    log "e7: stabilized adv run $ADV"
    echo "$ADV" > /tmp/r5_adv_run
    run_stage e8_adv_evidence 2400 /tmp/r5_adv_evidence.log -- \
      python -m isosurfacesuperresolution_tpu.apps.adv_evidence \
        --dataset /tmp/isosr_clips_mix4cd --samples 400 \
        --models bilinear runs/run00014 runs/run00016 "$ADV" \
        --output artifacts/quality/adv_evidence_r5
  else
    log "e7: no complete adv run"
  fi
else
  log "e6-e8 skipped: mix4cd cache missing"
fi

run_stage e9_width48_speed 1800 /tmp/r5_width48_speed.log -- \
  python bench.py --features 48 --no-ao --no-preempt
run_stage e10_width32_speed 1800 /tmp/r5_width32_speed.log -- \
  python bench.py --features 32 --no-ao --no-preempt

if [ -f /tmp/isosr_clips_mix4cd/low_00000.npy ]; then
  PRE=$(newest_run)
  run_stage e11_width48_train 6000 /tmp/r5_width48_train.log -- \
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
    log "e11: width-48 net $W48"
    echo "$W48" > /tmp/r5_w48_run
    run_stage e12_width48_crops 2400 /tmp/r5_width48_crops.log -- \
      python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
        --dataset /tmp/isosr_clips_mix4cd --samples 400 \
        --models bilinear runs/run00014 "$W48"
  else
    log "e11: no complete width-48 run"
  fi
else
  log "e11-e12 skipped: mix4cd cache missing"
fi

PRE512=$(newest_run)
run_stage e13_train512_extend 5400 /tmp/r5_train512.log -- \
  env EPOCHS=70 bash scripts/train_512.sh \
    --restore runs/run00015 --lr 5e-5 --lrStep 15 --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
NEW512=$(expect_new_run "$PRE512") || NEW512=""
if [ -n "$NEW512" ]; then
  log "e13: extended 512 net $NEW512"
  echo "$NEW512" > /tmp/r5_512_run
  run_stage e14_stats512 2400 /tmp/r5_stats512.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes /tmp/isosr_vol512/ejecta512.dat \
      --models bilinear runs/run00014 runs/run00015 "$NEW512" \
      --numSequences 5 --numFrames 6 --highRes 256 --aoSamples 64 \
      --isovalue 0.4 --output /tmp/r5_stats512
  mkdir -p artifacts/quality/r5_stats512 \
    && cp /tmp/r5_stats512/*.tsv /tmp/r5_stats512/*.npz \
         artifacts/quality/r5_stats512/ 2>/dev/null
else
  log "e13: no complete extended 512 run"
fi

if [ -f /tmp/isosr_clips_mix4cd/low_00000.npy ]; then
  run_stage e15_champion_extend 14400 /tmp/r5_champ_extend.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
      --dataset analytic:mix4 --numberOfImages 112 \
      --cameraDistance 0.6,1.3 \
      --cacheDataset /tmp/isosr_clips_mix4cd \
      --pretrained runs/run00014 \
      --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
      --epochs 120 --lr 2.5e-5 --lrStep 40 --gradClip 1.0 \
      --checkpointEvery 10 \
      --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
fi

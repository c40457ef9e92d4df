# Round-5 resume, take 3.  Take 2 got through e1 (far crops: run00017
# lifts every far-band channel over the champion), e3 (on-chip phase
# parity exact), e2 (1024^3+AO 65.1 -> 42.4 ms with the native
# half-res capture), e9/e10 (width-sweep speed half) — but:
#   - e4 (stats) died on a transient tunnel error
#     ("remote_compile: response body closed"), and
#   - e5 hit a TRUNCATED npy in /tmp/isosr_clips_mix4cd left behind by
#     resume-1's d1 timeout kill: the cache dir existed, so the loader
#     read it instead of regenerating and crashed.  The partial dir is
#     deleted before this driver launches.
# Width-48 measured 53.4 FPS no-AO vs ~50 at width-64: the planar
# network is layout/bandwidth-bound, not FLOP-bound, so the width
# QUALITY half (a 60-epoch training run) cannot buy a >55 FPS headline
# and is dropped in favor of the 512^3 extension (VERDICT 7) — the
# floor is re-declared with e9/e10's numbers in PERF.md.
#
# f4  five-analogue 6-frame stats incl. run00017, paired  (VERDICT 1+2)
# f5  mix4cd cache regen, clean dir, 7200s
# f6  crops full-band incl. run00017                      (VERDICT 1)
# f7  stabilized adversarial fine-tune + f8 evidence      (VERDICT 3)
# f13/f14  512^3 fine-tune extension + stats refresh      (VERDICT 7)
# f15 champion schedule extension until round-end preempt (VERDICT 8)

# wait for take-2's orphaned e10 (width-32 bench) child to release the
# tunnel; its pid is recorded by the session that killed that driver
if [ -f /tmp/r5_e10.pid ]; then
  E10=$(cat /tmp/r5_e10.pid)
  for i in $(seq 1 60); do
    kill -0 "$E10" 2>/dev/null || break
    sleep 20
  done
fi

run_stage f4_stats_all5 10800 /tmp/r5_stats6f.log -- \
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

run_stage f5_regen_mix4cd 7200 /tmp/r5_regen_mix4cd.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1
LATEST=$(newest_run)
if [ -n "$LATEST" ] && [ ! -f "$LATEST/params.npz" ]; then rm -rf "$LATEST"; fi

if [ -f /tmp/isosr_clips_mix4cd/low_00000.npy ]; then
  run_stage f6_crops_fullband 2400 /tmp/r5_crops_full.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
      --dataset /tmp/isosr_clips_mix4cd --samples 400 \
      --models bilinear bicubic runs/run00014 runs/run00017

  PRE=$(newest_run)
  run_stage f7_adv_stable 5400 /tmp/r5_adv_stable.log -- \
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
    log "f7: stabilized adv run $ADV"
    echo "$ADV" > /tmp/r5_adv_run
    run_stage f8_adv_evidence 2400 /tmp/r5_adv_evidence.log -- \
      python -m isosurfacesuperresolution_tpu.apps.adv_evidence \
        --dataset /tmp/isosr_clips_mix4cd --samples 400 \
        --models bilinear runs/run00014 runs/run00016 "$ADV" \
        --output artifacts/quality/adv_evidence_r5
  else
    log "f7: no complete adv run"
  fi
else
  log "f6-f8 skipped: mix4cd cache missing"
fi

PRE512=$(newest_run)
run_stage f13_train512_extend 5400 /tmp/r5_train512.log -- \
  env EPOCHS=70 bash scripts/train_512.sh \
    --restore runs/run00015 --lr 5e-5 --lrStep 15 --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
NEW512=$(expect_new_run "$PRE512") || NEW512=""
if [ -n "$NEW512" ]; then
  log "f13: extended 512 net $NEW512"
  echo "$NEW512" > /tmp/r5_512_run
  run_stage f14_stats512 2400 /tmp/r5_stats512.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes /tmp/isosr_vol512/ejecta512.dat \
      --models bilinear runs/run00014 runs/run00015 "$NEW512" \
      --numSequences 5 --numFrames 6 --highRes 256 --aoSamples 64 \
      --isovalue 0.4 --output /tmp/r5_stats512
  mkdir -p artifacts/quality/r5_stats512 \
    && cp /tmp/r5_stats512/*.tsv /tmp/r5_stats512/*.npz \
         artifacts/quality/r5_stats512/ 2>/dev/null
else
  log "f13: no complete extended 512 run"
fi

if [ -f /tmp/isosr_clips_mix4cd/low_00000.npy ]; then
  run_stage f15_champion_extend 14400 /tmp/r5_champ_extend.log -- \
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

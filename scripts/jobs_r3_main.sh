# Round-3 main job list (run by scripts/queue.sh).
#
# Goal (VERDICT.md round 2, items 1+2): ONE checkpoint that beats
# bilinear AND bicubic on every channel of every reference-dataset
# analogue at all camera distances, plus the committed five-analogue
# stats table.
#
# s1  consolidation training: mix4 zoo (mix3 + skull/thorax analogue
#     families, the two eval volumes missing from every round-2 zoo),
#     FULL camera-distance band 0.6-1.3 (subsumes both round-2
#     distance-banded checkpoints), GDL on normal+depth (charges
#     hallucinated gradient detail on smooth surfaces - the interface
#     failure mode), warm start from the round-2 all-rounder
#     artifacts/run00005, long schedule.  The 4.5 h timeout is the
#     scheduler: SIGTERM -> the trainer checkpoints at the next batch
#     boundary, so a timeout kill still yields a complete run dir.
# s2  held-out crops eval on the new full-band cache: new net vs both
#     round-2 banded nets, the GDL probe run00010 (VERDICT weak #3),
#     and interpolation.
# s3  far-band regression: regenerate the round-2 far cache (0.95-1.3)
#     and crops-eval the same model set - the check run00007 failed.
# s4a-e  five-analogue paper-stats, one stage per volume so every TSV
#     lands independently (mainPSNR3_AllStats.py:29-40 parity).

PRE=$(newest_run)
run_stage s1_train 16200 /tmp/r3_train.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --pretrained artifacts/run00005 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 400 --lr 1e-4 --lrStep 80 --gradClip 1.0 \
    --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:5,gdl:depth:5"

NEW=$(expect_new_run "$PRE")
if [ -z "$NEW" ]; then
  log "s1 produced no complete new run; falling back to artifacts/run00005"
  NEW=artifacts/run00005
fi
log "round-3 net: $NEW"

run_stage s2_crops_fullband 2400 /tmp/r3_crops_full.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix4cd --samples 400 \
    --models bilinear bicubic artifacts/run00005 artifacts/run00007 \
             runs/run00010 "$NEW"

if [ ! -f /tmp/isosr_clips_mix3far/low_00000.npy ]; then
  run_stage s3a_regen_far 9000 /tmp/r3_regen_far.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
      --dataset analytic:mix3 --numberOfImages 80 \
      --cacheDataset /tmp/isosr_clips_mix3far \
      --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1
fi
run_stage s3b_crops_far 2400 /tmp/r3_crops_far.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix3far --samples 400 \
    --models bilinear bicubic artifacts/run00005 artifacts/run00007 \
             runs/run00010 "$NEW"

for vol in turbulence ejecta interface skull thorax; do
  run_stage "s4_stats_$vol" 3600 "/tmp/r3_stats_$vol.log" -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes "analytic:$vol:256" \
      --models bilinear bicubic artifacts/run00005 "$NEW" \
      --numSequences 4 --numFrames 10 --highRes 256 --aoSamples 64 \
      --output /tmp/r3_stats
  mkdir -p artifacts/quality/r3_stats \
    && cp /tmp/r3_stats/*.tsv artifacts/quality/r3_stats/ 2>/dev/null
done

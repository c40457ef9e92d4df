# Round-3 consolidated evaluation pipeline (replaces the tail of
# jobs_r3_main.sh + jobs_r3_extra.sh once s1 training completes, with
# stage sizes budgeted to fit the remaining round time).
#
# f1  held-out crops on the full-band mix4 cache: new net vs both
#     round-2 banded nets, the GDL probe run00010, interpolation.
# f2  far-band (0.95-1.3) regression cache regen (48 seqs) + crops.
# f3  five-analogue paper stats (3 sequences per volume), one stage per
#     volume so each TSV lands independently.
# f4  adversarial evidence (texture metrics + panels).
# f5  re-measured AO perf rows (512^3, 1024^3 half-res bake).
# f6  512^3 extended training with whatever time remains
#     (checkpoint-safe under the round-end preemption).

NEW=$(newest_run)
if [ -z "$NEW" ] || [ ! -f "$NEW/params.npz" ]; then
  log "final: no complete run in runs/; falling back to artifacts/run00005"
  NEW=artifacts/run00005
fi
log "final: round-3 net = $NEW"

run_stage f1_crops_fullband 2400 /tmp/r3_crops_full.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix4cd --samples 400 \
    --models bilinear bicubic artifacts/run00005 artifacts/run00007 \
             runs/run00010 "$NEW"

if [ ! -f /tmp/isosr_clips_mix3far/low_00000.npy ]; then
  run_stage f2a_regen_far 5400 /tmp/r3_regen_far.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
      --dataset analytic:mix3 --numberOfImages 48 \
      --cacheDataset /tmp/isosr_clips_mix3far \
      --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1
fi
run_stage f2b_crops_far 2400 /tmp/r3_crops_far.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix3far --samples 400 \
    --models bilinear bicubic artifacts/run00005 artifacts/run00007 \
             runs/run00010 "$NEW"

for vol in turbulence ejecta interface skull thorax; do
  run_stage "f3_stats_$vol" 2700 "/tmp/r3_stats_$vol.log" -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes "analytic:$vol:256" \
      --models bilinear bicubic artifacts/run00005 "$NEW" \
      --numSequences 3 --numFrames 10 --highRes 256 --aoSamples 64 \
      --output /tmp/r3_stats
  mkdir -p artifacts/quality/r3_stats \
    && cp /tmp/r3_stats/*.tsv artifacts/quality/r3_stats/ 2>/dev/null
done

run_stage f4_adv_evidence 2400 /tmp/r3_adv_evidence.log -- \
  python -m isosurfacesuperresolution_tpu.apps.adv_evidence \
    --dataset /tmp/isosr_clips_mix4cd --samples 400 \
    --models bilinear artifacts/run00005 artifacts/run00003 "$NEW" \
    --output artifacts/quality/adv_evidence

# all-angle robustness of the consolidated net (round-2 protocol:
# random sphere cameras x rolls, full views live-rendered, bilinear
# reference comparison) - the "no weak angles" check for the one-net
# claim
run_stage f4b_allangles 2400 /tmp/r3_allangles.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_allangles \
    --volume analytic:blobs --cameras 20 --rolls 6 --lowRes 128 \
    --models bilinear artifacts/run00005 "$NEW" \
    --output /tmp/r3_allangles_out
cp /tmp/r3_allangles_out/*.tsv artifacts/quality/ 2>/dev/null

run_stage f5_perf_ao 5400 /tmp/r3_perf_ao.log -- \
  python scripts/bench_volumes.py --res 512,1024 --frames 10 --ao

run_stage f6_train512 10800 /tmp/r3_train512.log -- \
  env EPOCHS=120 bash scripts/train_512.sh

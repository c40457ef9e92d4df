# Round-4 eval pipeline - gated on jobs_r4_main.sh (AO point + champion
# retrain).  VERDICT r3 items 1, 2, 3, 4, 6:
#
# h0  re-measure 1024^3+AO (the g1 attempt regenerated the volume from
#     scratch and timed out; scripts/gen_volume_cache.py has since built
#     /tmp/blobs1024_u8.npz so this run starts at the bake)
# h1/h2  crops protocol, full-band + far-band, ALL candidate nets
#     (bilinear bicubic run00005 run00007 run00012 champion) - the
#     merged champion table's crops half
# h3..h7  five-analogue stats: 10 sequences x 6 frames with per-sequence
#     error bars (stats_*_err.tsv), models = interps + run00007 +
#     run00012 + champion.  10 sequences >= the VERDICT bar; 6 frames
#     keeps the five volumes inside the round's chip budget now that the
#     metric pass is a single fused jit per frame.
# h8  512^3 convergence fine-tune, warm from the champion (VERDICT item
#     3); SIGTERM-checkpoint-safe.
# h9  512^3-volume stats row (champion + 512-tuned net + bilinear).
# h10 adversarial evidence re-run including the champion (item 6).

until grep -q "QUEUE jobs_r4_main.sh DONE" "$S" 2>/dev/null; do
  alive=0
  for f in /tmp/queue_*.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f" 2>/dev/null)
    [ "$p" = "$$" ] && continue
    kill -0 "$p" 2>/dev/null && alive=1
  done
  if [ "$alive" = 0 ]; then
    log "eval: main driver gone without DONE marker; proceeding"
    break
  fi
  sleep 60
done
log "eval2: gate passed"

NEW=$(expect_new_run "$(cat /tmp/r4_pre_retrain 2>/dev/null)") || NEW=""
if [ -z "$NEW" ]; then
  log "eval: NO new champion run; falling back to runs/run00012"
  NEW=runs/run00012
else
  log "eval: champion candidate $NEW"
fi
echo "$NEW" > /tmp/r4_champion

run_stage h0_ao_perf_1024 2700 /tmp/r4_perf_ao1024b.log -- \
  python scripts/bench_volumes.py --res 1024 --frames 10 --ao

run_stage h1_crops_fullband 2400 /tmp/r4_crops_full.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix4cd --samples 400 \
    --models bilinear bicubic artifacts/run00005 artifacts/run00007 \
             runs/run00012 "$NEW"
# (crops tables print to stdout; the snapshotted stage log is the artifact)

run_stage h2_crops_far 2400 /tmp/r4_crops_far.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_crops \
    --dataset /tmp/isosr_clips_mix3far --samples 400 \
    --models bilinear bicubic artifacts/run00005 artifacts/run00007 \
             runs/run00012 "$NEW"

# ONE invocation for all five volumes: the jitted metric/inference
# programs compile once and serve every volume (5 separate processes
# paid ~3 min of recompiles each).  main_psnr_stats writes each
# volume's TSVs as it finishes, so a late crash keeps earlier volumes.
run_stage h3_stats_all5 10800 /tmp/r4_stats_all5.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
    --volumes analytic:turbulence:256 analytic:ejecta:256 \
              analytic:interface:256 analytic:skull:256 \
              analytic:thorax:256 \
    --models bilinear bicubic artifacts/run00007 runs/run00012 "$NEW" \
    --numSequences 10 --numFrames 6 --highRes 256 --aoSamples 64 \
    --output /tmp/r4_stats
mkdir -p artifacts/quality/r4_stats \
  && cp /tmp/r4_stats/*.tsv artifacts/quality/r4_stats/ 2>/dev/null

PRE512=$(newest_run)
run_stage h8_train512 5400 /tmp/r4_train512.log -- \
  env EPOCHS=45 bash scripts/train_512.sh \
    --pretrained "$NEW" --lr 5e-5 --lrStep 20 --checkpointEvery 5 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
NEW512=$(expect_new_run "$PRE512") || NEW512=""
[ -n "$NEW512" ] && log "eval: 512-tuned net $NEW512" \
  || log "eval: h8 produced no complete 512 run"

if [ -n "$NEW512" ]; then
  run_stage h9_stats512 2700 /tmp/r4_stats512.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
      --volumes /tmp/isosr_vol512/ejecta512.dat \
      --models bilinear "$NEW" "$NEW512" \
      --numSequences 6 --numFrames 6 --highRes 256 --aoSamples 64 \
      --isovalue 0.4 --output /tmp/r4_stats512
  mkdir -p artifacts/quality/r4_stats512 \
    && cp /tmp/r4_stats512/*.tsv artifacts/quality/r4_stats512/ 2>/dev/null
fi

run_stage h10_adv_evidence 2400 /tmp/r4_adv_evidence.log -- \
  python -m isosurfacesuperresolution_tpu.apps.adv_evidence \
    --dataset /tmp/isosr_clips_mix4cd --samples 400 \
    --models bilinear artifacts/run00005 artifacts/run00003 "$NEW" \
    --output artifacts/quality/adv_evidence_r4

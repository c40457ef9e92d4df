# Round-3 follow-on job list (run by scripts/queue.sh in a second
# driver).  Gates on the main queue finishing - marker in the status
# file, or the main driver no longer running (preempted/crashed) - then
# runs the short evidence/perf stages before the long 512^3 train.
#
# s5  adversarial evidence (VERDICT weak #7): texture/sharpness metrics
#     + side-by-side panels for the GAN fine-tune vs the L2 nets.
# s6  re-measured volume-perf AO rows (512^3 full-res bake, 1024^3
#     half-res bake) - the round-2 "+AO" rows never rendered AO.
# s7  512^3 extended training (VERDICT item 7): continue the plumbing
#     demo toward convergence; checkpoint-safe under preemption.

MAIN_MARKER="QUEUE jobs_r3_main.sh DONE"
main_alive() {
  for f in /tmp/queue.pid /tmp/queue_*.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f" 2>/dev/null)
    [ "$p" = "$$" ] && continue
    if kill -0 "$p" 2>/dev/null; then return 0; fi
  done
  return 1
}
until grep -q "$MAIN_MARKER" "$S" 2>/dev/null; do
  if ! main_alive; then
    log "extra: main driver gone without DONE marker; proceeding"
    break
  fi
  sleep 60
done
log "extra: gate passed"

NEW=$(newest_run)
MODELS="bilinear artifacts/run00005 artifacts/run00003"
if [ -n "$NEW" ] && [ -f "$NEW/params.npz" ]; then
  MODELS="$MODELS $NEW"
fi

if [ -f /tmp/isosr_clips_mix4cd/low_00000.npy ]; then
  run_stage s5_adv_evidence 2400 /tmp/r3_adv_evidence.log -- \
    python -m isosurfacesuperresolution_tpu.apps.adv_evidence \
      --dataset /tmp/isosr_clips_mix4cd --samples 400 \
      --models $MODELS \
      --output artifacts/quality/adv_evidence
else
  log "s5 skipped: mix4cd cache missing"
fi

run_stage s6_perf_ao 5400 /tmp/r3_perf_ao.log -- \
  python scripts/bench_volumes.py --res 512,1024 --frames 10 --ao

run_stage s7_train512 10800 /tmp/r3_train512.log -- \
  env EPOCHS=120 bash scripts/train_512.sh

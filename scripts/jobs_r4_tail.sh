# Round-4 tail: short on-chip measurements after the eval pipeline.
# Gated on jobs_r4_eval.sh's DONE marker (same pattern as the other
# chained drivers).

until grep -q "QUEUE jobs_r4_eval.sh DONE" "$S" 2>/dev/null; do
  alive=0
  for f in /tmp/queue_*.pid; do
    [ -f "$f" ] || continue
    p=$(cat "$f" 2>/dev/null)
    [ "$p" = "$$" ] && continue
    kill -0 "$p" 2>/dev/null && alive=1
  done
  if [ "$alive" = 0 ]; then
    log "tail: eval driver gone without DONE marker; proceeding"
    break
  fi
  sleep 60
done
log "tail: gate passed"

run_stage t1_phase_profile 1200 /tmp/r4_phase_profile.log -- \
  python scripts/profile_phase_blocked.py

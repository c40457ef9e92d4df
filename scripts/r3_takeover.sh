#!/bin/bash
# One-shot round-3 handover: the moment s1 training completes (rc line in
# the status file), retire BOTH in-flight queue drivers (main would start
# its unbudgeted 80-seq far regen; extra would race the final driver the
# moment main dies) and launch the consolidated, time-budgeted final
# pipeline (jobs_r3_final.sh) as the single queue driver.
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) takeover: $*" >> "$S"; }

until grep -q "stage s1_train rc=" "$S" 2>/dev/null; do sleep 30; done
log "s1 complete; retiring main+extra drivers"

# TERM the drivers first (no new stages), then any stage children still
# running (eval stages only at this point - nothing needs checkpointing;
# if s1's trainer is mid-SIGTERM-checkpoint, its tree gets a grace wait).
for f in /tmp/queue.pid /tmp/queue_*.pid; do
  [ -f "$f" ] || continue
  p=$(cat "$f" 2>/dev/null)
  kill -TERM "$p" 2>/dev/null && log "TERM driver $p ($f)"
done
sleep 2
# kill remaining stage children of the retired drivers via /proc children
for f in /tmp/queue.pid /tmp/queue_*.pid; do
  [ -f "$f" ] || continue
  p=$(cat "$f" 2>/dev/null)
  for t in /proc/"$p"/task/*/children; do
    [ -f "$t" ] || continue
    for c in $(cat "$t" 2>/dev/null); do
      kill -TERM "$c" 2>/dev/null && log "TERM stage child $c"
    done
  done
done
# wait for the trainer (if still checkpointing) and stage children to exit
for i in $(seq 1 30); do
  pgrep -f "apps.main_video_unshaded" >/dev/null 2>&1 || break
  sleep 5
done
rm -f /tmp/queue.pid /tmp/queue_*.pid

# a partially-regenerated far cache (killed mid-write) must not satisfy
# the final jobfile's existence check (48 seqs expected => last file
# low_00047.npy)
if [ -d /tmp/isosr_clips_mix3far ] \
   && [ ! -f /tmp/isosr_clips_mix3far/low_00047.npy ]; then
  rm -rf /tmp/isosr_clips_mix3far
  log "cleared partial far cache"
fi

log "launching final pipeline"
nohup bash scripts/queue.sh scripts/jobs_r3_final.sh \
  > /tmp/queue_r3_final_driver.log 2>&1 &
log "final driver pid $!"

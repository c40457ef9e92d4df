#!/bin/bash
# Single parameterized TPU work-queue driver (replaces the round-2
# tpu_queue2..20.sh family).
#
# Usage:   scripts/queue.sh <jobfile>
#
# The jobfile is a bash script sourced by this driver; it expresses its
# stages through the helpers below:
#
#   run_stage <name> <timeout_s> <logfile> -- <cmd...>
#       wait for the TPU tunnel, run <cmd> under `timeout`, log the rc to
#       /tmp/tpu_queue.status, snapshot the log into artifacts/logs/, and
#       return the command's rc (so the jobfile can gate later stages).
#
#   newest_run            echo the newest runs/run00* dir
#   expect_new_run <pre>  echo the newest run dir IFF it is complete
#                         (config.json + params.npz) and different from
#                         <pre> (the pre-training snapshot); empty + rc 1
#                         otherwise.  Guards against evaluating a stale
#                         run as if it were the one just trained
#                         (round-2 advisor finding).
#   log <msg>             timestamped line into /tmp/tpu_queue.status
#
# The driver records its own PID to /tmp/queue.pid (removed on exit via
# trap) so bench.py's preempt_queues() can free the single-client TPU
# tunnel; training stages checkpoint on SIGTERM, making that preemption
# checkpoint-safe.
cd "$(dirname "$0")/.." || exit 1
JOB="$1"
if [ -z "$JOB" ] || [ ! -f "$JOB" ]; then
  echo "usage: scripts/queue.sh <jobfile>" >&2
  exit 2
fi
S=/tmp/tpu_queue.status
# unique per-driver pid file (still matched by bench.py's /tmp/queue*.pid
# glob) so chained drivers gated on each other never collide.
# ISOSR_QUEUE_PIDDIR: tests sandbox the pid file so a concurrently
# running real driver can't make pidfile-lifecycle assertions flaky.
PIDFILE=${ISOSR_QUEUE_PIDDIR:-/tmp}/queue_$$.pid
echo $$ > "$PIDFILE"
trap 'rm -f "$PIDFILE"' EXIT

log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }
probe() { timeout 150 python -c "import jax; jax.devices()" >/dev/null 2>&1; }
wait_up() {
  # ISOSR_QUEUE_NO_PROBE: tests exercise the driver without creating a
  # jax client (the probe itself would grab the single-client tunnel)
  [ -n "$ISOSR_QUEUE_NO_PROBE" ] && return 0
  until probe; do log "tunnel down, retry in 180s"; sleep 180; done
  log "tunnel UP"
}
newest_run() { ls -d runs/run00* 2>/dev/null | sort | tail -1; }
expect_new_run() {
  local pre="$1" new
  new=$(newest_run)
  if [ -z "$new" ] || [ "$new" = "$pre" ] \
     || [ ! -f "$new/config.json" ] || [ ! -f "$new/params.npz" ]; then
    return 1
  fi
  echo "$new"
}
run_stage() {
  local name="$1" to="$2" lf="$3"
  shift 3
  [ "$1" = "--" ] && shift
  wait_up
  log "stage $name START (timeout ${to}s)"
  timeout "$to" "$@" > "$lf" 2>&1
  local rc=$?
  log "stage $name rc=$rc"
  mkdir -p artifacts/logs && cp "$lf" artifacts/logs/ 2>/dev/null
  return $rc
}

log "=== queue $(basename "$JOB") start $(date -u) pid=$$ ==="
source "$JOB"
log "=== QUEUE $(basename "$JOB") DONE $(date -u) ==="

#!/bin/bash
# Durable-artifact watcher.
#
# The host VM can be recycled at any time, wiping /tmp and the gitignored
# runs/ directory (this lost round 2's first set of trained checkpoints).
# This loop snapshots every run's small committable artifacts
# (params.npz + config.json + info.txt + the crop-eval tables) into the
# tracked artifacts/ directory and commits them, so trained models survive
# a recycle.  Commits touch ONLY artifacts/ (git commit -- pathspec), so a
# concurrently working session never gets its staged files swept in.
cd "$(dirname "$0")/.."
mkdir -p artifacts

# Run-name remapping for THIS VM generation: the recycle emptied runs/,
# so the trainer restarts numbering at run00001 while artifacts/ already
# holds historical checkpoints under those names (run00001 = stage-1
# mix2 net, run00002 = 512^3 demo, run00003 = adversarial stage-2 —
# all cited by README tables).  Snapshot the new generation's runs under
# fresh names instead of clobbering.  (The trainer now also skips
# artifact names when allocating run dirs, so this table is only needed
# for runs already in flight when that fix landed.)
map_name() {
  case "$1" in
    run00001) echo run00007 ;;   # v17 s1 close-camera retrain
    run00002) echo run00008 ;;   # v17 s3 cache-regen throwaway
    run00003) echo run00009 ;;   # v17 s9 adversarial fine-tune
    *) echo "$1" ;;
  esac
}

while true; do
  changed=0
  for d in runs/run00*; do
    [ -d "$d" ] || continue
    name=$(map_name "$(basename "$d")")
    mkdir -p "artifacts/$name"
    for f in params.npz config.json info.txt; do
      if [ -f "$d/$f" ] && ! cmp -s "$d/$f" "artifacts/$name/$f"; then
        cp "$d/$f" "artifacts/$name/$f"; changed=1
      fi
    done
  done
  # Also snapshot queue logs + status so progress is inspectable post-recycle.
  mkdir -p artifacts/logs
  for f in /tmp/tpu_queue.status /tmp/q*_*.log /tmp/r3_*.log; do
    [ -f "$f" ] || continue
    b=$(basename "$f")
    if ! cmp -s "$f" "artifacts/logs/$b"; then cp "$f" "artifacts/logs/$b"; changed=1; fi
  done
  if [ "$changed" = 1 ]; then
    git add artifacts >/dev/null 2>&1
    git commit -q -m "Snapshot run artifacts and queue logs" -- artifacts || true
  fi
  sleep 900
done

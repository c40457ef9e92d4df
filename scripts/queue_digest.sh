#!/bin/bash
# Summarize the current tpu_queue stage logs into one digest.
echo "=== status ==="; cat /tmp/tpu_queue.status 2>/dev/null
for f in /tmp/q17_crops.log /tmp/q17_crops_old.log /tmp/q17_crops_adv.log; do
  [ -f "$f" ] || continue
  echo "=== $f ==="
  grep -E "test crops|model |bilinear|bicubic|runs/|artifacts/" "$f" | head -20
done
for f in /tmp/q17_stats.log /tmp/q17_stats2.log; do
  [ -f "$f" ] || continue
  echo "=== $f (tail) ==="
  tail -30 "$f"
done
for f in /tmp/q17_allangles.log /tmp/q17_allangles_ao.log; do
  [ -f "$f" ] || continue
  echo "=== $f (tail) ==="
  tail -12 "$f"
done
for f in /tmp/q17_train.log /tmp/q17_adv.log /tmp/q17_regen.log; do
  [ -f "$f" ] || continue
  echo "=== $f (tail) ==="
  tail -4 "$f"
done

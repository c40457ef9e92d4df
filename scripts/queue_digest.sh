#!/bin/bash
# Summarize the tpu_queue.sh stage logs into one digest.
echo "=== status ==="; cat /tmp/tpu_queue.status 2>/dev/null
for f in /tmp/q_eval8.log /tmp/q_eval_rebal.log /tmp/q_eval_adv.log; do
  [ -f "$f" ] || continue
  echo "=== $f ==="
  grep -E "test crops|model |bilinear|bicubic|runs/" "$f" | head -20
done
for f in /tmp/q_vol512.log /tmp/q_vol1024.log; do
  [ -f "$f" ] || continue
  echo "=== $f ==="
  grep -E "^\||generated in|loaded cached|HBM|ms" "$f" | head -20
done
for f in /tmp/q_rebal.log /tmp/q_train512.log /tmp/q_adv.log; do
  [ -f "$f" ] || continue
  echo "=== $f (tail) ==="
  tail -6 "$f"
done
if [ -f /tmp/q_bench.log ]; then
  echo "=== bench ==="; cat /tmp/q_bench.log
fi

#!/bin/bash
# Summarize the current queue stage logs into one digest.
echo "=== status ==="; tail -30 /tmp/tpu_queue.status 2>/dev/null
for f in /tmp/r3_*.log /tmp/q*_*.log; do
  [ -f "$f" ] || continue
  echo "=== $f (tail) ==="
  case "$f" in
    *crops*|*stats*|*evidence*)
      grep -E "test crops|model |nearest|bilinear|bicubic|run0|wrote|Error" \
        "$f" | tail -25 ;;
    *)
      tail -6 "$f" ;;
  esac
done

#!/bin/bash
# Follower queue: int8-PTQ measurements, runs AFTER scripts/tpu_queue2.sh
# finishes (single-TPU-client rule).  Waits for the v2 DONE marker in
# /tmp/tpu_queue.status, then:
#   1. headline bench with the int8 trunk/post convs (bench.py --int8)
#   2. int8-vs-f32 quality A/B on the newest non-adversarial run
cd "$(dirname "$0")/.."
S=/tmp/tpu_queue.status
log() { echo "$(date -u +%H:%M:%S) $*" >> "$S"; }

until grep -q "QUEUE v2 DONE" "$S" 2>/dev/null; do sleep 120; done
log "=== queue v2b (int8) start $(date -u) ==="

timeout 2400 python bench.py --int8 > /tmp/q2_bench_int8.log 2>&1
log "int8 bench rc=$? $(tail -1 /tmp/q2_bench_int8.log | head -c 200)"

RUN=$(ls -d runs/run00* | sort | tail -2 | head -1)   # newest stage-1 (last is adv)
timeout 2400 python scripts/eval_int8.py \
  --dataset /tmp/isosr_clips_mix2ao --run "$RUN" --samples 400 \
  > /tmp/q2_int8_eval.log 2>&1
log "int8 eval ($RUN) rc=$?"

log "=== queue v2b DONE $(date -u) ==="

# Round-5 final stage: the f13 512^3 extension failed because
# `--restore runs/run00015` needs the orbax checkpoints/ tree and the
# VM recycle kept only the artifact-snapshot params.npz.  Rerun with
# `--pretrained` (params-only warm start from epoch 30, fresh
# optimizer at the post-step lr) and let round-end preemption bank
# whatever it reaches (SIGTERM checkpoint writes params.npz).
# train_512.sh already rebuilt the volume + clip cache this round, so
# this goes straight to training.
PRE512=$(newest_run)
run_stage g13_train512_extend 14400 /tmp/r5_train512b.log -- \
  env EPOCHS=70 bash scripts/train_512.sh \
    --pretrained runs/run00015 --lr 5e-5 --lrStep 15 --checkpointEvery 5 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
NEW512=$(expect_new_run "$PRE512") || NEW512=""
if [ -n "$NEW512" ]; then
  log "g13: extended 512 net $NEW512"
  echo "$NEW512" > /tmp/r5_512_run
fi

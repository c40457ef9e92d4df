# Round-4 main pipeline (VERDICT r3 items 1+2):
#
# g1  honest 1024^3+AO perf point with the FIXED host-pooled half-res
#     bake (the r3 f5 job OOM'd on a 256 GiB tile-padded reshape,
#     artifacts/logs/r3_perf_ao.log; fix: render/ao_sweep.py host slab
#     pooling).  512^3+AO was already honestly measured in the same r3
#     log (22.23 ms = 45.0 FPS); PERF.md is updated from both.
# g2  the corrective consolidation retrain that round 3 banked but never
#     ran (jobs_r3_post.sh p2): warm from run00007 (the close-band net
#     that wins all six crops channels), cached full-band mix4 zoo, GDL
#     reduced to 2/2 (run00012's gdl:4 @ lr 1e-4 over-smoothed normals,
#     -5.4 dB far-band), lr 5e-5 with a step at 60 so the curve shows
#     saturation across an lr step.  SIGTERM-checkpoint-safe; 140 epochs
#     fits the 3h stage budget at ~70 s/epoch.
#
# The eval pipeline (crops + five-analogue stats with per-sequence error
# bars) is a separate jobfile gated on this driver's DONE marker.

rm -f /tmp/skip_train512

run_stage g1_ao_perf 2700 /tmp/r4_perf_ao1024.log -- \
  python scripts/bench_volumes.py --res 1024 --frames 10 --ao

PRE=$(newest_run)
echo "$PRE" > /tmp/r4_pre_retrain
run_stage g2_retrain 11400 /tmp/r4_retrain.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 112 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4cd \
    --pretrained artifacts/run00007 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 140 --lr 5e-5 --lrStep 60 --gradClip 1.0 \
    --checkpointEvery 10 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:normal:2,gdl:depth:2"
NEW=$(expect_new_run "$PRE") \
  && log "round-4 champion candidate: $NEW" \
  || log "g2 produced no complete new run"

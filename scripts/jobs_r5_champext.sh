# Round-5 overtime: VERDICT item 8 (champion schedule extension), now
# pointed at the NEW champion run00017.  Its training cache (the 160-seq
# 7:3 near+far interleave) died with the VM recycle, so regenerate it
# first (epochs-1 trainer pass); if round-end preemption lands during
# the regen, nothing of value is lost - the chip was otherwise idle.
# The extension itself restores run00017's recipe (per-channel GDL) at
# lr 1.25e-5 (half the fine-tune's final rate) and banks a checkpoint
# every 10 epochs via SIGTERM-safe saves.
run_stage h1_regen_mix4far 7200 /tmp/r5_regen_mix4far.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 160 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4far \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 64 --epochs 1
LATEST=$(newest_run)
if [ -n "$LATEST" ] && [ ! -f "$LATEST/params.npz" ]; then rm -rf "$LATEST"; fi

if [ -f /tmp/isosr_clips_mix4far/low_00000.npy ]; then
  run_stage h2_champ17_extend 28800 /tmp/r5_champ17_extend.log -- \
    python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
      --dataset analytic:mix4 --numberOfImages 160 \
      --cameraDistance 0.6,1.3 \
      --cacheDataset /tmp/isosr_clips_mix4far \
      --pretrained runs/run00017 \
      --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
      --epochs 120 --lr 1.25e-5 --lrStep 40 --gradClip 1.0 \
      --checkpointEvery 10 \
      --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:depth:2"
else
  log "h2 skipped: mix4far cache missing"
fi

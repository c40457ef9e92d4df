# Round-5 main pipeline — VERDICT r4 items 3a, 1, 6, launched first
# because none of it needs new code:
#
# a1  adv_evidence of the banked run00016 (epoch-7 params, ckpt-5 also
#     banked): does the diverging adversarial fine-tune's PSNR drop buy
#     any gram/texture win over its parent run00014?  (VERDICT item 3)
# a2  per-channel GDL fine-tune from the champion: drop gdl:normal
#     (keep gdl:depth:2), train on the interleaved near+far combined
#     cache /tmp/isosr_clips_mix4far (112 mix4cd + 48 mix3far seqs,
#     7:3 interleave so the trailing test split sees both bands).
#     Attacks the one cell where plain interpolation still beats the
#     net: far-band crops normals (VERDICT item 1).
# a3  champion stats at the 10-frame protocol (VERDICT item 6): same
#     five analytic volumes, numFrames 10 instead of 6, so the README
#     can state 22/25 at both warmup lengths.

run_stage a1_adv_eval16 2400 /tmp/r5_adv_eval16.log -- \
  python -m isosurfacesuperresolution_tpu.apps.adv_evidence \
    --dataset /tmp/isosr_clips_mix4cd --samples 400 \
    --models bilinear artifacts/run00003 runs/run00014 runs/run00016 \
    --output artifacts/quality/adv_evidence_r16

PRE=$(newest_run)
echo "$PRE" > /tmp/r5_pre_gdl
run_stage a2_gdl_finetune 5400 /tmp/r5_gdl_finetune.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
    --dataset analytic:mix4 --numberOfImages 160 \
    --cameraDistance 0.6,1.3 \
    --cacheDataset /tmp/isosr_clips_mix4far \
    --pretrained runs/run00014 \
    --batchSize 8 --remat --dataDtype bfloat16 --samples 2000 \
    --epochs 40 --lr 2.5e-5 --lrStep 20 --gradClip 1.0 \
    --checkpointEvery 5 \
    --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,gdl:depth:2"
NEWGDL=$(expect_new_run "$PRE") || NEWGDL=""
if [ -n "$NEWGDL" ]; then
  log "a2: GDL fine-tune run $NEWGDL"
  echo "$NEWGDL" > /tmp/r5_gdl_run
else
  log "a2: no complete GDL run"
fi

run_stage a3_stats10f 9000 /tmp/r5_stats10f.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
    --volumes analytic:turbulence:256 analytic:ejecta:256 \
              analytic:interface:256 analytic:skull:256 \
              analytic:thorax:256 \
    --models bilinear bicubic runs/run00014 \
    --numSequences 10 --numFrames 10 --highRes 256 --aoSamples 64 \
    --output /tmp/r5_stats10f
mkdir -p artifacts/quality/r5_stats10f \
  && cp /tmp/r5_stats10f/*.tsv /tmp/r5_stats10f/*.npz \
       artifacts/quality/r5_stats10f/ 2>/dev/null

# Round-5 final eval: 512-volume stats row refresh with the completed
# run00022 extension (f14 of jobs_r5_resume3.sh, unblocked now that
# g13 finished all 70 epochs before round end).
run_stage g14_stats512 3600 /tmp/r5_stats512.log -- \
  python -m isosurfacesuperresolution_tpu.apps.main_psnr_stats \
    --volumes /tmp/isosr_vol512/ejecta512.dat \
    --models bilinear runs/run00014 runs/run00015 runs/run00017 \
             runs/run00022 \
    --numSequences 5 --numFrames 6 --highRes 256 --aoSamples 64 \
    --isovalue 0.4 --output /tmp/r5_stats512
mkdir -p artifacts/quality/r5_stats512 \
  && cp /tmp/r5_stats512/*.tsv /tmp/r5_stats512/*.npz \
       artifacts/quality/r5_stats512/ 2>/dev/null

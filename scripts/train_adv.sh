#!/bin/bash
# Stage 2: perceptual + adversarial fine-tune from a stage-1 checkpoint.
# Reference regime: mainVideoUnshaded.py --pretrained <stage1> with the
# adversarial/perceptual losses of trainAdv_v2 (:397-473).  Note: without
# pretrained VGG-19 weights in the environment the perceptual term uses
# the fixed-seed random-feature fallback (losses/vgg.py warns loudly);
# the adversarial term is weight-free and exact.
#
# Usage: scripts/train_adv.sh [stage1_run_dir] [epochs]
set -e
cd "$(dirname "$0")/.."
STAGE1=${1:-runs/run00007}
EPOCHS=${2:-60}

# Cache path matches queue v3's stage-1 cache (fixed baked-AO targets) so
# the fine-tune sees the exact dataset instance the stage-1 net trained on
# and the eval harness scores against; L1 weights keep run00009's
# mask/ao rebalance.
timeout 14000 python -m isosurfacesuperresolution_tpu.apps.main_video_unshaded \
  --dataset analytic:mix2 --numberOfImages 64 \
  --cacheDataset /tmp/isosr_clips_mix2ao \
  --batchSize 8 --remat --dataDtype bfloat16 \
  --samples 2000 --epochs "$EPOCHS" \
  --pretrained "$STAGE1" \
  --lr 2e-5 --lrStep 30 --gradClip 1.0 --checkpointEvery 10 \
  --advTraining --advDiscrLr 1e-4 \
  --losses "l1:mask:5,l1:ao:8,l1:normal:10,l1:depth:10,l1:color:2,temp-l2:color:0.1,perceptual:color:0.02,texture:color:0.002,adv:all:0.3"

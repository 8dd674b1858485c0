#!/bin/bash
# End-to-end S3D finetune on HTM-AA clips
# (reference end2end/main_nce.py:416-427 launch recipe: --freezeBN --sim cos
#  --auto_align_tag htm_aa_v1 --epochs 40 --batch_size 16 --num_frames 16
#  --fps 5; DDP replaced by the jax DP mesh — multi-host via --multihost).
set -euo pipefail
exec python -m exoground_tpu.train.main \
    --dataset htm-aa \
    --model s3d \
    --freezeBN \
    --sim cos \
    --auto_align_tag htm_aa_v1 \
    --epochs 40 \
    --batch_size 16 \
    --num_frames 16 \
    --fps 5 \
    "$@"

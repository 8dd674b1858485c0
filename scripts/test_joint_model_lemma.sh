#!/bin/bash
# LEMMA joint-model test protocol
# (reference train/test_joint_model_lemma.sh flag surface).
set -euo pipefail
CKPT=${1:?usage: $0 <checkpoint.pth.tar> [extra flags...]}; shift || true
exec python -m exoground_tpu.train.main \
    --dataset lemma \
    --batch_size 16 \
    --num_workers 0 \
    --use_keysteps \
    --views all \
    --exos all \
    --model joint \
    --use_distill_nce_loss \
    --test "$CKPT" "$@"

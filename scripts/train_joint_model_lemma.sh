#!/bin/bash
# LEMMA joint grounding + distillation train
# (reference train/train_joint_model_lemma.sh flag surface; LEMMA has no
# minimum_four_exo_takes / curriculum — 2 fixed views).
set -euo pipefail
PREFIX=${1:?usage: $0 <name_prefix> [extra flags...]}; shift || true
exec python -m exoground_tpu.train.main \
    --dataset lemma \
    --batch_size 16 \
    --epochs 100 \
    --num_workers 0 \
    --use_keysteps \
    --views all \
    --exos all \
    --model joint \
    --use_distill_nce_loss \
    --name_prefix "$PREFIX" "$@"

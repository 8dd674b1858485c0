#!/bin/bash
# Keystep grounding train with a frozen VI encoder
# (reference train/train_grounding.sh:23-33 flag surface).
set -euo pipefail
PREFIX=${1:?usage: $0 <name_prefix> <vi_encoder_ckpt> [extra flags...]}
VI=${2:?usage: $0 <name_prefix> <vi_encoder_ckpt> [extra flags...]}; shift 2 || true
exec python -m exoground_tpu.train.main \
    --dataset egoexo4d \
    --batch_size 16 \
    --epochs 100 \
    --num_workers 0 \
    --use_keysteps \
    --views all \
    --exos all \
    --model grounding \
    --minimum_four_exo_takes \
    --vi_encoder_path "$VI" \
    --name_prefix "$PREFIX" "$@"

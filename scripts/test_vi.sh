#!/bin/bash
# View-invariant encoder test (VI distill metrics per view rank)
# (reference train/test_vi.sh flag surface).
set -euo pipefail
CKPT=${1:?usage: $0 <checkpoint.pth.tar> [extra flags...]}; shift || true
exec python -m exoground_tpu.train.main \
    --dataset egoexo4d \
    --batch_size 16 \
    --num_workers 0 \
    --use_keysteps \
    --views all \
    --exos all \
    --model view_invariant \
    --use_distill_nce_loss \
    --minimum_four_exo_takes \
    --same_view_negative \
    --test "$CKPT" "$@"

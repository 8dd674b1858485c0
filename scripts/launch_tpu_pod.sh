#!/bin/bash
# Multi-host TPU pod launcher — the TPU-native counterpart of the reference's
# SLURM srun/torchrun bootstrap (reference train/train_grounding.sh:1-23).
#
# On a Cloud TPU pod slice every host runs the SAME command;
# jax.distributed.initialize() (called by exoground_tpu.train.main) discovers
# peers from the TPU metadata — no rendezvous flags, no RANK/WORLD_SIZE.
#
#   scripts/launch_tpu_pod.sh <tpu-name> <zone> -- <args for train.main...>
#
# Single host (v4-8 / v5e-8 or CPU dev box): just run
#   python -m exoground_tpu.train.main <args>
set -euo pipefail

if [ "$#" -lt 3 ]; then
    echo "usage: $0 <tpu-name> <zone> -- <train.main args...>" >&2
    exit 1
fi
TPU_NAME=$1; ZONE=$2; shift 2
[ "$1" = "--" ] && shift

# %q-quote each arg so values with spaces/metacharacters survive the remote
# shell's re-splitting (e.g. --name_prefix "vi run1")
ARGS=$(printf '%q ' "$@")

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
    --command "cd ~/exoground_tpu && python -m exoground_tpu.train.main $ARGS"

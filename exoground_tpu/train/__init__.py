from exoground_tpu.train.optim import (
    FusedAdamWEMA,
    clip_per_param_norm,
    make_fused_optimizer,
    make_optimizer,
    warmup_cosine_schedule,
)
from exoground_tpu.train.config import ExperimentConfig, parse_args, set_path
from exoground_tpu.train.checkpoint import (
    latest_runtime_checkpoint,
    load_state,
    restore_into,
    save_checkpoint,
    save_runtime_checkpoint,
    save_state,
)
from exoground_tpu.train.logging import AsyncWriter, DeviceMonitor, ProfilerHook, Timer
from exoground_tpu.train.trainer import EgoExoTrainer, S3DTrainer, TANTrainer

"""Raw-video clip loader for the end-to-end S3D finetune stage.

Rebuild of reference end2end/video_loader.py:39-174 (HTM_ClipLoader): decode
an HTM video at ``fps`` around a narration timestamp, random-crop to
crop_size², return (num_clips, T, H, W, 3) float frames in [0, 1] (NDHWC for
the TPU S3D) + tokenized text from the HTM-AA alignment csv.

Decode runs on host CPU through the ffmpeg binary (rawvideo pipe — the same
architecture as the reference's ffmpeg-python filter graph). When ffmpeg is
absent the loader emits grey frames, the reference's own decode-failure
fallback (video_loader.py:164-166), so the pipeline stays runnable in
feature-only environments.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from exoground_tpu.data.collate import collate_dicts


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def decode_clip(
    path: str,
    start_sec: float,
    num_frames: int = 16,
    fps: int = 5,
    crop: int = 224,
    scale: int = 256,
    rng: Optional[np.random.RandomState] = None,
    dtype: str = "float32",
) -> np.ndarray:
    """Decode ``num_frames`` at ``fps`` from ``start_sec``, random-crop to
    crop² (center crop when rng is None). Returns (T, H, W, 3) float32 [0,1],
    or raw uint8 [0,255] with ``dtype="uint8"`` — the TPU-native transfer
    format: clips cross host→device as 1 byte/px (4× fewer bytes than f32)
    and the jitted step normalizes on device (u8→f32 is exact, so /255 there
    matches this host path bit for bit). Grey-frame fallback on any decode
    failure (reference :164-166; uint8 grey is 128 ≈ 0.502, the nearest
    representable value to the reference's 0.5)."""
    duration = num_frames / fps
    if ffmpeg_available() and os.path.exists(path):
        cmd = [
            "ffmpeg", "-nostdin", "-loglevel", "error",
            "-ss", f"{start_sec:.3f}", "-t", f"{duration + 0.5:.3f}",
            "-i", path,
            "-vf", f"fps={fps},scale={scale}:{scale}",
            "-pix_fmt", "rgb24", "-f", "rawvideo", "-",
        ]
        try:
            raw = subprocess.run(
                cmd, capture_output=True, timeout=60, check=True
            ).stdout
            n = len(raw) // (scale * scale * 3)
            if n >= 1:
                frames = np.frombuffer(
                    raw[: n * scale * scale * 3], np.uint8
                ).reshape(n, scale, scale, 3)
                if n < num_frames:  # repeat last frame
                    frames = np.concatenate(
                        [frames, np.repeat(frames[-1:], num_frames - n, 0)], 0
                    )
                frames = frames[:num_frames]
                if rng is not None:
                    y = rng.randint(0, scale - crop + 1)
                    x = rng.randint(0, scale - crop + 1)
                else:
                    y = x = (scale - crop) // 2
                cropped = frames[:, y : y + crop, x : x + crop]
                if dtype == "uint8":
                    return np.ascontiguousarray(cropped)
                return cropped.astype(np.float32) / 255.0
        except (subprocess.SubprocessError, ValueError, OSError):
            pass
    if dtype == "uint8":
        # 128/255 ~= 0.50196 vs the reference's exact 0.5: uint8 cannot
        # represent 0.5, and emitting a float32 item here would promote the
        # whole collated batch (retracing the jitted step). Documented
        # parity deviation, decode-failure path only — PARITY.md round 4.
        return np.full((num_frames, crop, crop, 3), 128, np.uint8)
    return np.full((num_frames, crop, crop, 3), 0.5, np.float32)


@dataclass
class ClipConfig:
    video_root: str = ""
    fps: int = 5
    num_frames: int = 16
    num_clips: int = 1
    crop_size: int = 224
    scale_size: int = 256
    token_len: int = 16
    seed: int = 0
    # "uint8" (default): clips upload raw and normalize inside the jitted
    # step — 4x fewer H2D bytes on the rawest-input pipeline in the
    # framework. "float32" reproduces the reference's host-side /255.
    clip_dtype: str = "uint8"


class HTMClipDataset:
    """HTM-AA clip dataset (reference end2end/video_loader.py:39-174).

    ``pairs``: [{'vid', 'text', 'start', 'end'}, ...] — the HTM-AA csv rows
    (htm_aa/readme.md format). Each item samples a clip window inside the
    aligned span and tokenizes the text.
    """

    def __init__(self, cfg: ClipConfig, pairs: List[Dict], tokenizer):
        self.cfg = cfg
        self.pairs = pairs
        self.tokenizer = tokenizer
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return len(self.pairs)

    def _rng(self, idx):
        return np.random.RandomState(
            (self.cfg.seed * 1_000_003 + self.epoch * 7919 + idx) % (2**31 - 1)
        )

    def __getitem__(self, idx: int) -> Dict:
        cfg = self.cfg
        rng = self._rng(idx)
        row = self.pairs[idx]
        span = max(float(row["end"]) - float(row["start"]), 0.0)
        clip_dur = cfg.num_frames / cfg.fps
        clips = []
        for _ in range(cfg.num_clips):
            jitter = rng.rand() * max(span - clip_dur, 0.0)
            start = float(row["start"]) + jitter
            path = os.path.join(cfg.video_root, f"{row['vid']}.mp4")
            clips.append(
                decode_clip(
                    path, start, cfg.num_frames, cfg.fps,
                    cfg.crop_size, cfg.scale_size, rng,
                    dtype=cfg.clip_dtype,
                )
            )
        token = np.asarray(
            self.tokenizer(str(row["text"]))["input_ids"], np.int32
        ).reshape(-1)[: cfg.token_len]
        token = np.pad(token, (0, cfg.token_len - token.shape[0]))
        return {
            "video": np.stack(clips),  # (num_clips, T, H, W, 3)
            "token": token,
            "vid": row["vid"],
        }

    collate_fn = staticmethod(collate_dicts)

"""Visual feature extraction template (htm_zoo rebuild).

Reference htm_zoo/visual/extract_feature_template.py: decode long videos at
1 fps (CLIP-L14) or 8 fps (InternVideo) with ffmpeg, run a half-precision
image/video encoder, write one feature file per video.

TPU-native mapping:
  * fp16 weight conversion + fp32-LayerNorm shim (:67-108) becomes
    ``bf16_params_keep_layernorm``: params cast to bfloat16 EXCEPT LayerNorm
    scales/biases (and logit scales), which stay float32 — same numerical
    intent (normalization statistics at full precision, matmuls at half);
  * the encoder is any jittable ``encode_fn(params, frames) -> (B, D)``;
    frames batch to a fixed bucket so the whole video runs through one
    compiled program;
  * host decode stays ffmpeg (gated); precomputed frame arrays also accepted.
"""

from __future__ import annotations

import os
import subprocess
from dataclasses import dataclass
from typing import Callable, Iterable, List, Optional

import numpy as np


def bf16_params_keep_layernorm(params, ln_keys=("ln_", "layernorm", "layer_norm", "scale")):
    """Cast a param pytree to bf16, keeping normalization params (and any
    path containing an ln_keys substring) in float32 — the TPU analogue of
    the reference's fp16 conversion + fp32 LayerNorm shim (:67-108)."""
    import jax
    import jax.numpy as jnp

    def cast(path, x):
        pstr = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        ).lower()
        if any(k in pstr for k in ln_keys) or "logit_scale" in pstr:
            return x.astype(jnp.float32)
        return x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree_util.tree_map_with_path(cast, params)


def probe_duration(path: str) -> Optional[float]:
    """Video duration in seconds via ffprobe (reference :159-179)."""
    import shutil

    if shutil.which("ffprobe") is None:
        return None
    try:
        out = subprocess.run(
            ["ffprobe", "-v", "error", "-show_entries", "format=duration",
             "-of", "csv=p=0", path],
            capture_output=True, timeout=30, check=True,
        ).stdout.decode().strip()
        return float(out)
    except (subprocess.SubprocessError, ValueError):
        return None


def decode_frames(
    path: str, fps: int = 1, size: int = 224, center_crop: bool = True
) -> Optional[np.ndarray]:
    """Full-video frame decode at ``fps`` -> (T, size, size, 3) f32 [0,1]
    (reference decodes via ffmpeg-python filter graphs, :199-216)."""
    import shutil

    if shutil.which("ffmpeg") is None or not os.path.exists(path):
        return None
    vf = (
        f"fps={fps},scale={size}:{size}:force_original_aspect_ratio=increase,"
        f"crop={size}:{size}" if center_crop else f"fps={fps},scale={size}:{size}"
    )
    try:
        raw = subprocess.run(
            ["ffmpeg", "-nostdin", "-loglevel", "error", "-i", path,
             "-vf", vf, "-pix_fmt", "rgb24", "-f", "rawvideo", "-"],
            capture_output=True, timeout=600, check=True,
        ).stdout
    except subprocess.SubprocessError:
        return None
    n = len(raw) // (size * size * 3)
    if n == 0:
        return None
    return (
        np.frombuffer(raw[: n * size * size * 3], np.uint8)
        .reshape(n, size, size, 3).astype(np.float32) / 255.0
    )


@dataclass
class ExtractConfig:
    fps: int = 1  # 1 for CLIP-style per-second, 8 for InternVideo
    frame_bucket: int = 256  # frames per device call (static shape)
    half: bool = True  # bf16 weights (fp32 LayerNorm kept)
    out_dtype: str = "float16"  # feature file dtype (reference saves fp16)


def extract_video_features(
    encode_fn: Callable,  # (params, frames (B, H, W, 3)) -> (B, D)
    params,
    frames: np.ndarray,  # (T, H, W, 3) decoded at cfg.fps
    cfg: ExtractConfig = ExtractConfig(),
) -> np.ndarray:
    """Run the encoder over a video's frames in fixed buckets and pool to one
    feature per second -> (seconds, D)."""
    import jax
    import jax.numpy as jnp

    if cfg.half:
        params = bf16_params_keep_layernorm(params)
    fn = jax.jit(encode_fn)
    t = frames.shape[0]
    if t == 0:  # decode succeeded but yielded no frames: empty feature track
        return np.zeros((0, 1), cfg.out_dtype)
    feats: List[np.ndarray] = []
    for i in range(0, t, cfg.frame_bucket):
        chunk = frames[i : i + cfg.frame_bucket]
        valid = chunk.shape[0]
        if valid < cfg.frame_bucket:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], cfg.frame_bucket - valid, 0)], 0
            )
        x = jnp.asarray(chunk, jnp.bfloat16 if cfg.half else jnp.float32)
        out = np.asarray(fn(params, x), np.float32)[:valid]
        feats.append(out)
    per_frame = np.concatenate(feats, 0)
    if cfg.fps > 1:  # pool fps frames -> one per-second vector
        sec = per_frame.shape[0] // cfg.fps
        per_frame = per_frame[: sec * cfg.fps].reshape(sec, cfg.fps, -1).mean(1)
    return per_frame.astype(cfg.out_dtype)


def extract_corpus(
    encode_fn: Callable,
    params,
    video_paths: Iterable[str],
    out_dir: str,
    cfg: ExtractConfig = ExtractConfig(),
    frame_loader: Optional[Callable[[str], Optional[np.ndarray]]] = None,
) -> List[str]:
    """Corpus driver: decode -> encode -> save {vid}.npy per video, skipping
    already-extracted files (restartable, reference template behavior)."""
    os.makedirs(out_dir, exist_ok=True)
    loader = frame_loader or (lambda p: decode_frames(p, cfg.fps))
    written = []
    for path in video_paths:
        vid = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(out_dir, f"{vid}.npy")
        if os.path.exists(out_path):
            continue
        frames = loader(path)
        if frames is None:
            print(f"[extract] decode failed, skipping {path}")
            continue
        feats = extract_video_features(encode_fn, params, frames, cfg)
        np.save(out_path, feats)
        written.append(out_path)
    return written

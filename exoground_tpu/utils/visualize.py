"""Qualitative outputs: similarity grids, annotated dual videos, feature dumps.

Rebuilds the reference's visualization surface:
  * TAN similarity-grid images (train/loss.py:429-517: imshow of the (T, N)
    video-text similarity with GT segment boxes) — matplotlib;
  * side-by-side pred/GT annotated grounding videos
    (train/loss_egoexo4d.py:365-527) — OpenCV, gated on source video files;
  * per-window feature dumps (loss_egoexo4d.py:530-566).

All host-side, consuming numpy outputs of the jitted eval steps.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def plot_similarity_grid(
    sim: np.ndarray,  # (T, N) video-time x text similarity
    starts: Sequence[float],
    ends: Sequence[float],
    out_path: str,
    title: str = "",
    pred_starts: Optional[Sequence[float]] = None,
    pred_ends: Optional[Sequence[float]] = None,
):
    """Similarity heatmap with GT (green) and predicted (red) segment spans
    per text (reference train/loss.py:429-517 'plot_sim' images)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    t, n = sim.shape
    fig, ax = plt.subplots(figsize=(max(4, n * 0.6), max(3, t * 0.05)))
    ax.imshow(sim, aspect="auto", cmap="viridis")
    for j in range(min(n, len(starts))):
        ax.plot([j - 0.4, j - 0.4], [starts[j], ends[j]], color="lime", lw=2)
        if pred_starts is not None:
            ax.plot(
                [j + 0.4, j + 0.4],
                [pred_starts[j], pred_ends[j]],
                color="red", lw=2,
            )
    ax.set_xlabel("text")
    ax.set_ylabel("video time (s)")
    if title:
        ax.set_title(title, fontsize=8)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path


def annotate_frame(
    frame, narrs, starts, ends, pad_mask, current_frame, start_frame,
    fps, seq_len, label,
):
    """Overlay the active narration on a frame (loss_egoexo4d.py:495-527:
    first valid narration whose normalized span covers this frame)."""
    import cv2

    font = cv2.FONT_HERSHEY_SIMPLEX
    for i in range(len(starts)):
        if pad_mask[i]:
            continue
        s_f = int(starts[i] * seq_len * fps) + start_frame
        e_f = int(ends[i] * seq_len * fps) + start_frame
        if s_f <= current_frame < e_f:
            text = f"{label}: {narrs[i]}"
            (tw, th), _ = cv2.getTextSize(text, font, 0.5, 1)
            cv2.rectangle(frame, (10, 20 - th - 2), (10 + tw, 22), (255, 255, 255), -1)
            cv2.putText(frame, text, (10, 20), font, 0.5, (0, 0, 0), 1)
            break
    return frame


def visualize_dual_video(
    video_path: str,
    out_path: str,
    narrs: List[str],
    pred_starts, pred_ends, gt_starts, gt_ends, pad_mask,
    start_sec: float, seq_len: int,
) -> Optional[str]:
    """Side-by-side pred/GT annotated clip (loss_egoexo4d.py:365-462).
    Returns out_path, or None when the source video is unavailable."""
    import cv2

    if not os.path.exists(video_path):
        return None
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    start_frame = int(start_sec * fps)
    end_frame = int((start_sec + seq_len) * fps)
    cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    out = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w * 2, h)
    )
    cur = start_frame
    while cur < end_frame:
        ok, frame = cap.read()
        if not ok:
            break
        f_pred = annotate_frame(
            frame.copy(), narrs, pred_starts, pred_ends, pad_mask,
            cur, start_frame, fps, seq_len, "P",
        )
        f_gt = annotate_frame(
            frame, narrs, gt_starts, gt_ends, pad_mask,
            cur, start_frame, fps, seq_len, "GT",
        )
        out.write(np.hstack([f_pred, f_gt]))
        cur += 1
    cap.release()
    out.release()
    return out_path


def save_features_to_dir(
    base_dir: str,
    metadata: Dict[str, List],
    output_features: np.ndarray,  # (B, T, C) model low-dim features
    target_features: Optional[np.ndarray] = None,  # (B, V, T, C)
    positive_idxs: Optional[np.ndarray] = None,
):
    """Per-window feature dump tree base/take/cam/start_sec/*.npy
    (reference loss_egoexo4d.py:530-566)."""
    os.makedirs(base_dir, exist_ok=True)
    written = []
    for i, (take, cam, start) in enumerate(
        zip(metadata["video_id"], metadata["exo_camera"], metadata["start_sec"])
    ):
        d = os.path.join(base_dir, str(take), str(cam), str(start))
        os.makedirs(d, exist_ok=True)
        np.save(os.path.join(d, "output_features.npy"), output_features[i])
        if target_features is not None:
            np.save(os.path.join(d, "ego_seq.npy"), target_features[i])
        if positive_idxs is not None:
            np.save(os.path.join(d, "positive_idxs.npy"), positive_idxs[i])
        written.append(d)
    return written

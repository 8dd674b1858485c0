"""Scripted feature-space visualization (notebook replacement).

Production counterpart of the reference's exploratory
``visualization/visualize_features.ipynb``: loads the trainer's per-window
feature dumps (utils/visualize.save_features_to_dir tree, mirroring reference
loss_egoexo4d.py:530-566), then renders

  1. cosine-similarity heatmaps between the model's output features and the
     positive-view target features (notebook cell ``compute_similarity_
     heatmap``), and
  2. a 2-D embedding scatter (t-SNE or PCA) of output / all-view / positive-
     view features, standardized jointly and colored by group (notebook cells
     ``normalize_features`` / ``apply_tsne`` / ``plot_tsne``).

Everything is a plain function over numpy arrays so it tests without files;
the CLI consumes a dump directory and writes PNGs.

Usage:
    python -m exoground_tpu.tools.visualize_features \
        --features_dir <dump root> --out_dir <pngs> --method pca
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

import numpy as np


def load_feature_dumps(base_dir: str) -> List[Dict]:
    """Walk the base/take/cam/start_sec tree written by
    utils/visualize.save_features_to_dir; one record per window."""
    records = []
    for take in sorted(os.listdir(base_dir)):
        tdir = os.path.join(base_dir, take)
        if not os.path.isdir(tdir):
            continue
        for cam in sorted(os.listdir(tdir)):
            cdir = os.path.join(tdir, cam)
            if not os.path.isdir(cdir):
                continue  # stray files (notes, .DS_Store) don't abort the walk
            def _num(s):
                try:
                    float(s)
                    return True
                except ValueError:
                    return False
            for start in sorted(filter(_num, os.listdir(cdir)), key=float):
                d = os.path.join(cdir, start)
                feat_path = os.path.join(d, "output_features.npy")
                if not (os.path.isdir(d) and os.path.exists(feat_path)):
                    continue
                rec = {
                    "video_id": take,
                    "exo_cam": cam,
                    "start_sec": float(start),
                    "output_features": np.load(feat_path),
                }
                for name, key in (
                    ("ego_seq.npy", "target_features"),
                    ("positive_idxs.npy", "positive_idxs"),
                ):
                    p = os.path.join(d, name)
                    if os.path.exists(p):
                        rec[key] = np.load(p)
                records.append(rec)
    return records


def gather_positive_view(
    target: np.ndarray,  # (V, T, C) multi-view bank
    positive_idxs: np.ndarray,  # (T,) positive view index per timestep
) -> np.ndarray:
    """(T, C) per-timestep positive-view features (indices clipped into V)."""
    t = target.shape[1]
    return target[np.clip(positive_idxs, 0, target.shape[0] - 1), np.arange(t)]


def cosine_similarity_heatmap(
    output: np.ndarray,  # (T, C)
    target: np.ndarray,  # (V, T, C) multi-view bank
    positive_idxs: np.ndarray,  # (T,) positive view index per timestep
) -> np.ndarray:
    """(T, T) cosine similarity between output features and the positive
    view's target features (notebook compute_similarity_heatmap)."""
    pos = gather_positive_view(target, positive_idxs)
    a = output / np.maximum(np.linalg.norm(output, axis=-1, keepdims=True), 1e-8)
    b = pos / np.maximum(np.linalg.norm(pos, axis=-1, keepdims=True), 1e-8)
    return a @ b.T


def standardize(groups: List[np.ndarray]) -> List[np.ndarray]:
    """Joint zero-mean/unit-variance scaling across all groups
    (notebook normalize_features: StandardScaler over the vstack)."""
    flat = np.vstack(groups)
    mu = flat.mean(axis=0, keepdims=True)
    sd = np.maximum(flat.std(axis=0, keepdims=True), 1e-8)
    return [(g - mu) / sd for g in groups]


def project_2d(
    groups: List[np.ndarray],
    method: str = "pca",
    seed: int = 0,
    perplexity: float = 30.0,
) -> List[np.ndarray]:
    """Embed each group's rows into 2-D jointly. 'pca' (numpy SVD, no deps)
    or 'tsne' (sklearn, like the notebook)."""
    groups = standardize(groups)
    flat = np.vstack(groups)
    if method == "tsne":
        from sklearn.manifold import TSNE

        emb = TSNE(
            n_components=2, random_state=seed,
            perplexity=min(perplexity, max(2.0, (len(flat) - 1) / 3.0)),
            init="pca",
        ).fit_transform(flat)
    elif method == "pca":
        centered = flat - flat.mean(axis=0, keepdims=True)
        _, _, vt = np.linalg.svd(centered, full_matrices=False)
        emb = centered @ vt[:2].T
    else:
        raise ValueError(method)
    splits = np.cumsum([len(g) for g in groups[:-1]])
    return np.split(emb, splits)


def plot_projection(
    embeddings: List[np.ndarray],
    labels: List[str],
    out_path: str,
    title: str = "",
):
    """Scatter of the 2-D embedding, one color per group (notebook plot_tsne)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 6))
    for emb, label in zip(embeddings, labels):
        ax.scatter(emb[:, 0], emb[:, 1], s=12, alpha=0.7, label=label)
    ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def plot_heatmap(heatmap: np.ndarray, out_path: str, title: str = ""):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(heatmap, aspect="auto", cmap="viridis")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("positive-view target timestep")
    ax.set_ylabel("output timestep")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def visualize_dump_dir(
    features_dir: str,
    out_dir: str,
    method: str = "pca",
    max_windows: Optional[int] = 16,
) -> List[str]:
    """Render heatmap + projection PNGs for every dumped window."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    records = load_feature_dumps(features_dir)
    if max_windows:
        records = records[:max_windows]
    for rec in records:
        tag = f"{rec['video_id']}_{rec['exo_cam']}_{int(rec['start_sec'])}"
        groups = [rec["output_features"]]
        labels = ["output"]
        if "target_features" in rec:
            tgt = rec["target_features"]  # (V, T, C)
            groups.append(tgt.reshape(-1, tgt.shape[-1]))
            labels.append("all views")
            if "positive_idxs" in rec:
                groups.append(gather_positive_view(tgt, rec["positive_idxs"]))
                labels.append("positive view")
                written.append(plot_heatmap(
                    cosine_similarity_heatmap(
                        rec["output_features"], tgt, rec["positive_idxs"]
                    ),
                    os.path.join(out_dir, f"{tag}_heatmap.png"),
                    title=f"output vs positive-view sim — {tag}",
                ))
        emb = project_2d(groups, method=method)
        written.append(plot_projection(
            emb, labels,
            os.path.join(out_dir, f"{tag}_{method}.png"),
            title=f"{method.upper()} feature embedding — {tag}",
        ))
    return written


def compare_runs(
    run_dirs: List[str],
    out_dir: str,
    method: str = "pca",
    max_windows: Optional[int] = 16,
    labels: Optional[List[str]] = None,
) -> str:
    """Multi-run feature comparison (reference
    visualization/parallel_vis_feat.ipynb): load each run's feature dumps,
    jointly standardize, embed ALL runs in one 2-D projection, one color per
    run — the notebook's distill-vs-no-distill-vs-no-curriculum t-SNE."""
    os.makedirs(out_dir, exist_ok=True)
    labels = labels or [os.path.basename(os.path.normpath(d)) for d in run_dirs]
    groups = []
    for d in run_dirs:
        records = load_feature_dumps(d)
        if max_windows:
            records = records[:max_windows]
        if not records:
            raise ValueError(f"no feature dumps under {d}")
        groups.append(np.vstack([r["output_features"] for r in records]))
    emb = project_2d(groups, method=method)
    return plot_projection(
        emb, labels,
        os.path.join(out_dir, f"compare_{method}.png"),
        title=f"{method.upper()} output-feature embedding by run",
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--features_dir", required=True, nargs="+",
                    help="one dump dir; several = multi-run comparison plot")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--method", default="pca", choices=["pca", "tsne"])
    ap.add_argument("--max_windows", type=int, default=16)
    ap.add_argument("--labels", nargs="*", default=None,
                    help="per-run legend labels for the comparison plot")
    args = ap.parse_args(argv)
    if len(args.features_dir) > 1:
        path = compare_runs(
            args.features_dir, args.out_dir, args.method, args.max_windows,
            labels=args.labels,
        )
        print(f"wrote {path}")
        return [path]
    paths = visualize_dump_dir(
        args.features_dir[0], args.out_dir, args.method, args.max_windows
    )
    print(f"wrote {len(paths)} images to {args.out_dir}")
    return paths


if __name__ == "__main__":
    main()

"""Deterministic synthetic LEMMA world, shared by the reference oracle
parity test (tests/test_oracle_lemma_loader.py) and the self-contained
data-layer golden fixtures. Window order is fully deterministic on both
sides, so frozen items compare positionally."""

import numpy as np

FPS = 24
DUR = 16
HOP = 8
VDIM = 12
NDIM = 4096  # hardcoded narration pad width (loader_lemma.py:260)

VIDEOS = [("vid_a", 40), ("vid_b", 30)]
ANNOS = [
    # (vid, nid, start_frame, end_frame, hoi_idx) — hoi 99 has no feature
    ("vid_a", "a1", 24, 240, 3),
    ("vid_a", "a2", 200, 500, 5),
    ("vid_a", "a3", 480, 900, 7),
    ("vid_a", "a4", 300, 400, 99),
    ("vid_b", "b1", 0, 120, 3),
    ("vid_b", "b2", 400, 680, 8),
]
HOI_TEXT = {3: "peel the fruit", 5: "pour water", 7: "open the fridge",
            8: "wipe the table", 99: "missing"}

# configs frozen into the golden fixture (test adds ego-as-exo rows and flips
# per_second_views, loader_lemma.py:123-125,152-155)
GOLDEN_CONFIGS = {
    "train_distill": ("train", True),
    "train_plain": ("train", False),
    "test_distill": ("test", True),
}

COMPARE_KEYS = ("video_features", "video_padding_mask", "narration_features",
                "narration_padding_mask", "starts", "ends", "mean",
                "duration", "ego_video_features", "view_rank_label",
                "view_rank_neg_label", "valid_views_mask")
META_KEYS = ("narrations", "video_id", "exo_camera", "per_second_views")


def build_lemma_world(root):
    """Split rows + HOI annotations + per-camera feature files. ``root`` is a
    pathlib.Path of an existing empty directory; arrays regenerate bit-exactly
    (fixed numpy seed). The on-disk .pt tree serves the reference loader; the
    in-memory dicts serve ours through FeatureStore."""
    import torch

    vfeat_root = root / "vid_feats"
    nfeat_root = root / "keystep_feats"
    nfeat_root.mkdir()
    r = np.random.RandomState(11)
    mem_video = {}
    for vid, dur in VIDEOS:
        for cam in ("fpv1", "master"):
            arr = r.randn(dur, VDIM).astype(np.float32)
            mem_video[f"{vid}_{cam}"] = arr
            d = vfeat_root / vid / cam
            d.mkdir(parents=True)
            torch.save(torch.from_numpy(arr), d / f"{vid}_{cam}_combined.pt")
    mem_narr = {}
    for hoi in (3, 5, 7, 8):
        arr = r.randn(1, NDIM).astype(np.float32)
        mem_narr[str(hoi)] = arr
        torch.save(torch.from_numpy(arr), nfeat_root / f"{hoi}.pt")

    return {
        "root": root, "videos": VIDEOS, "annos": ANNOS, "hoi_text": HOI_TEXT,
        "vfeat_root": str(vfeat_root), "nfeat_root": str(nfeat_root),
        "mem_video": mem_video, "mem_narr": mem_narr,
    }


def make_our_loader(world, split, **flags):
    from exoground_tpu.data.io import FeatureStore
    from exoground_tpu.data.lemma import LemmaConfig, LemmaDataset

    cfg = LemmaConfig(duration=DUR, hop_length=HOP, fps=FPS,
                      feature_dim=NDIM, **flags)
    return LemmaDataset(
        cfg,
        split_rows=[{"video_id": v, "duration_sec": d}
                    for v, d in world["videos"]],
        annotations=[
            {"vid_name": v, "unique_narration_id": n, "start_frame": s,
             "end_frame": e, "narration": f"HOI {h}"}
            for v, n, s, e, h in world["annos"]
        ],
        hoi_text_map=dict(world["hoi_text"]),
        video_store=FeatureStore(mem=world["mem_video"]),
        narration_store=FeatureStore(mem=world["mem_narr"]),
        split=split,
    )


def window_key(row):
    return (str(row["video_id"]), str(row["exo_cam"]), str(row["ego_cam"]),
            int(row["start_sec"]))

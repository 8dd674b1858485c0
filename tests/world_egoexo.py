"""Deterministic synthetic EgoExo4D on-disk world, shared by the reference
oracle parity tests (tests/test_oracle_egoexo_loader.py) and the
self-contained data-layer golden fixtures (tests/test_golden_data.py +
exoground_tpu/tools/gen_golden_fixtures.py): the golden fixture freezes the
reference loader's items over EXACTLY this world, so our loader's protocol is
regression-tested without the reference mounted.

Needs torch + pandas (to write the .pt feature files the loaders read); both
are baked into the environment — the golden tests stay independent of
/root/reference only.
"""

import json
import os

import numpy as np

FPS = 30
DUR = 20
HOP = 10
VDIM = 16  # video feature dim (free); narration dim is the reference's
NDIM = 4096  # hardcoded 4096 (loader_egoexo4d.py:538)


def _rot(axis, angle):
    """Rodrigues rotation matrix (keeps the synthetic extrinsics valid)."""
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _extrinsic(seed):
    r = np.random.RandomState(seed)
    R = _rot(r.randn(3), float(r.uniform(0.2, 2.8)))
    t = r.uniform(-3, 3, 3)
    return np.hstack([R, t[:, None]]).tolist()  # 3x4


def build_egoexo_world(root):
    """One synthetic EgoExo4D tree (split csv, annotation csv, takes.json,
    camera rankings, camera poses, .pt feature files) consumed by BOTH
    loaders. ``root`` is a pathlib.Path of an existing empty directory; the
    tree regenerates bit-exactly (fixed numpy seeds)."""
    import pandas as pd
    import torch

    takes = [
        ("take_a", "uid_a", 45, "aria01", ["cam01", "cam02", "cam03"]),
        ("take_b", "uid_b", 35, "aria02", ["cam01", "cam02"]),
    ]

    # ---- takes.json + the precompute-side video-file tree
    takes_json = [
        {"take_name": name,
         "frame_aligned_videos": {c: {} for c in cams + [ego]}}
        for name, _, _, ego, cams in takes
    ]
    with open(root / "takes.json", "w") as f:
        json.dump(takes_json, f)
    vids_dir = root / "takes_videos"
    for name, _, _, ego, cams in takes:
        fav = vids_dir / name / "frame_aligned_videos"
        fav.mkdir(parents=True)
        for c in cams + [ego]:
            (fav / f"{c}.mp4").touch()

    # ---- split + annotations csv
    pd.DataFrame([
        {"take_name": n, "take_uid": u, "duration_sec": d,
         "ego_camera_path": f"/x/{e}.mp4"}
        for n, u, d, e, _ in takes
    ]).to_csv(root / "split.csv", index=False)
    annos = [
        # (take, nid, start_frame, end_frame)  — n4 has no feature file
        ("take_a", "n1", 60, 300, "add the flour"),
        ("take_a", "n2", 270, 600, "mix it well"),
        ("take_a", "n3", 450, 1000, "knead the dough"),
        ("take_a", "n4", 300, 450, "missing feature"),
        ("take_a", "n5", 1100, 1300, "shape the loaf"),
        ("take_b", "m1", 0, 150, "wash hands"),
        ("take_b", "m2", 500, 900, "cut vegetables"),
    ]
    pd.DataFrame([
        {"take_uid": t, "unique_narration_id": n, "start_frame": s,
         "end_frame": e, "narration": txt}
        for t, n, s, e, txt in annos
    ]).to_csv(root / "annos.csv", index=False)

    # ---- feature files
    vfeat = root / "video_features"
    nfeat = root / "narration_features"
    vfeat.mkdir()
    r = np.random.RandomState(7)
    for name, _, d, ego, cams in takes:
        for c in cams + [ego]:
            torch.save(torch.from_numpy(r.randn(d, VDIM).astype(np.float32)),
                       vfeat / f"{name}_{c}.pt")
    for t, n, _, _, _ in annos:
        if n == "n4":
            continue
        (nfeat / t).mkdir(parents=True, exist_ok=True)
        torch.save(torch.from_numpy(r.randn(1, NDIM).astype(np.float32)),
                   nfeat / t / f"{n}.pt")

    # ---- per-second camera rankings (exo-cam names, rank-keyed)
    rankings = {}
    for name, uid, d, _, cams in takes:
        per_sec = {}
        for t in range(d):
            order = list(np.roll(cams, t % len(cams)))
            per_sec[str(t)] = {str(i): c for i, c in enumerate(order)}
        rankings[uid] = per_sec
    with open(root / "rankings.json", "w") as f:
        json.dump(rankings, f)

    # ---- camera poses (geometric view-order path)
    poses_dir = root / "poses"
    poses_dir.mkdir()
    for i, (name, uid, d, ego, cams) in enumerate(takes):
        frames = {str(int((s + DUR / 2) * FPS)): _extrinsic(100 + i)
                  for s in range(0, d - DUR + 1, HOP)}
        pose = {ego.replace("aria01", "aria01_slam").replace(
            "aria02", "aria02_slam"): {"camera_extrinsics": frames}}
        # exo cams: static extrinsics
        for j, c in enumerate(cams):
            pose[c] = {"camera_extrinsics": _extrinsic(200 + 10 * i + j)}
        pose["metadata"] = {"ignored": True}
        with open(poses_dir / f"{uid}.json", "w") as f:
            json.dump(pose, f)

    return {
        "root": root, "takes": takes, "rankings": rankings,
        "split_csv": str(root / "split.csv"),
        "annos_csv": str(root / "annos.csv"),
        "takes_json": str(root / "takes.json"),
        "rankings_json": str(root / "rankings.json"),
        "vfeat": str(vfeat), "nfeat": str(nfeat),
        "vids_dir": str(vids_dir), "poses_dir": str(poses_dir),
    }


def make_our_loader(world, **flags):
    """Our EgoExo4DDataset over the world (shared by oracle + golden tests)."""
    from exoground_tpu.data.egoexo4d import (
        EgoExo4DDataset, EgoExoConfig, EgoExoSource,
    )

    split = flags.pop("split", "val")
    cfg = EgoExoConfig(
        duration=DUR, hop_length=HOP, fps=FPS, feature_dim=NDIM, **flags
    )
    src = EgoExoSource.from_paths(
        split_csv=world["split_csv"],
        annotations_csv=world["annos_csv"],
        camera_rankings_json=world["rankings_json"],
        takes_json=world["takes_json"],
        video_feature_root=world["vfeat"],
        narration_feature_root=world["nfeat"],
        camera_pose_root=world["poses_dir"],
    )
    return EgoExo4DDataset(cfg, src, split=split)


def make_our_tan_loader(world):
    """Our EgoExo4DTANDataset over the world (val/exo/joint config)."""
    from exoground_tpu.data.egoexo4d import (
        EgoExo4DTANDataset, EgoExoConfig, EgoExoSource,
    )

    src = EgoExoSource.from_paths(
        split_csv=world["split_csv"], annotations_csv=world["annos_csv"],
        camera_rankings_json=world["rankings_json"],
        takes_json=world["takes_json"], video_feature_root=world["vfeat"],
        narration_feature_root=world["nfeat"],
    )
    return EgoExo4DTANDataset(
        EgoExoConfig(duration=DUR, hop_length=HOP, fps=FPS, feature_dim=NDIM,
                     views="exo", model="joint"),
        src, split="val",
    )


def window_key(row):
    return (str(row["video_id"]), str(row["exo_cam"]), str(row["ego_cam"]),
            int(row["start_sec"]), int(row["end_sec"]),
            str(row["narration_ids"]))


# item fields compared/frozen (the full __getitem__ tensor surface)
COMPARE_KEYS = (
    "video_features", "video_padding_mask", "narration_features",
    "narration_padding_mask", "starts", "ends", "mean", "duration",
    "ego_video_features", "view_rank_label", "view_rank_neg_label",
    "valid_views_mask", "view_available_mask",
)
META_KEYS = ("narrations", "video_id", "exo_camera", "per_second_views",
             "narr_ranks")

# deterministic configs frozen into the golden fixture (every non-randomized
# __getitem__ branch: canonical joint val, VI reverse-ranking train,
# exo-exo distillation, stitched multi-view single-exo inference)
GOLDEN_CONFIGS = {
    "all_joint_val": dict(split="val", views="all", model="joint",
                          use_distill_nce_loss=True),
    "exo_vi_reverse": dict(split="train", views="exo", model="view_invariant",
                           use_distill_nce_loss=True, reverse_ranking=True),
    "exo_exo_distill": dict(split="train", views="exo", model="joint",
                            use_distill_nce_loss=True, exo_exo_distill=True),
    "single_exo_inference": dict(split="val", views="exo", model="joint",
                                 use_distill_nce_loss=True,
                                 multi_view_single_exo_inference=True,
                                 num_max_views=6),
}

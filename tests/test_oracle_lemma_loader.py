"""Item-level protocol parity for the LEMMA data layer.

Runs the reference's ACTUAL ``LemmaDataLoader`` (torch, imported from
/root/reference/data/loader_lemma.py, instantiated via ``__new__`` because
its ``__init__`` hardcodes cluster paths, :43-47) against our
``data/lemma.py::LemmaDataset`` on one shared synthetic world: split csv
rows, HOI keystep annotations, HOI text map, per-camera feature files
(reference reads ``{vid}/{cam}/{vid}_{cam}_combined.pt``; ours gets the same
arrays through an in-memory FeatureStore). Covers train and test splits
(test adds ego-as-exo rows and flips per_second_views, loader_lemma.py:
123-125,152-155), with and without distillation outputs.
"""

import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isdir(os.path.join(REF_ROOT, "data")),
                       reason="reference not mounted"),
]

FPS = 24
DUR = 16
HOP = 8
VDIM = 12
NDIM = 4096  # hardcoded narration pad width (loader_lemma.py:260)


@pytest.fixture(scope="module")
def ref_cls():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    for p in (REF_ROOT, os.path.join(REF_ROOT, "data")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from data.loader_lemma import LemmaDataLoader

    return LemmaDataLoader


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    import torch

    root = tmp_path_factory.mktemp("lemma_world")
    videos = [("vid_a", 40), ("vid_b", 30)]
    annos = [
        # (vid, nid, start_frame, end_frame, hoi_idx) — hoi 99 has no feature
        ("vid_a", "a1", 24, 240, 3),
        ("vid_a", "a2", 200, 500, 5),
        ("vid_a", "a3", 480, 900, 7),
        ("vid_a", "a4", 300, 400, 99),
        ("vid_b", "b1", 0, 120, 3),
        ("vid_b", "b2", 400, 680, 8),
    ]
    hoi_text = {3: "peel the fruit", 5: "pour water", 7: "open the fridge",
                8: "wipe the table", 99: "missing"}

    vfeat_root = root / "vid_feats"
    nfeat_root = root / "keystep_feats"
    nfeat_root.mkdir()
    r = np.random.RandomState(11)
    mem_video = {}
    for vid, dur in videos:
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
        "root": root, "videos": videos, "annos": annos, "hoi_text": hoi_text,
        "vfeat_root": str(vfeat_root), "nfeat_root": str(nfeat_root),
        "mem_video": mem_video, "mem_narr": mem_narr,
    }


def _ref_loader(ref_cls, world, tmp_path, split, **flags):
    import pandas as pd

    obj = ref_cls.__new__(ref_cls)
    cfg = dict(
        split=split, duration=DUR, hop_length=HOP, views="all",
        use_distill_nce_loss=True, curriculum_train=False,
        same_view_negative=False, use_tf_video_features=False,
        reverse_ranking=False, randomize_ranking=False, fps=FPS,
    )
    cfg.update(flags)
    for k, v in cfg.items():
        setattr(obj, k, v)
    obj.current_phase = 0
    obj.annotations = pd.DataFrame([
        {"vid_name": v, "unique_narration_id": n, "start_frame": s,
         "end_frame": e, "narration": f"HOI {h}"}
        for v, n, s, e, h in world["annos"]
    ])
    obj.split_data = pd.DataFrame([
        {"video_id": v, "duration_sec": d} for v, d in world["videos"]
    ])
    obj.video_feature_path = world["vfeat_root"]
    obj.narration_feature_path = world["nfeat_root"]
    obj.hoi_idx_to_text_map = dict(world["hoi_text"])
    obj.unique_narr_id_to_hoi_idx_map = {
        r["unique_narration_id"]: r["narration"].removeprefix("HOI ")
        for _, r in obj.annotations.iterrows()
    }
    obj.window_csv_path = str(tmp_path / f"ref_lemma_{split}_windows.csv")
    obj.precompute_windows()
    return obj


def _our_loader(world, split, **flags):
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


KEYS = ("video_features", "video_padding_mask", "narration_features",
        "narration_padding_mask", "starts", "ends", "mean", "duration",
        "ego_video_features", "view_rank_label", "view_rank_neg_label",
        "valid_views_mask")


@pytest.mark.parametrize("split,distill", [
    ("train", True), ("train", False), ("test", True),
])
def test_lemma_items_match_reference(ref_cls, world, tmp_path, split, distill):
    ref = _ref_loader(ref_cls, world, tmp_path, split,
                      use_distill_nce_loss=distill)
    ours = _our_loader(world, split, use_distill_nce_loss=distill)

    ref_keys = [
        (r["video_id"], r["exo_cam"], r["ego_cam"], int(r["start_sec"]))
        for _, r in ref.windows.iterrows()
    ]
    our_keys = [
        (w["video_id"], w["exo_cam"], w["ego_cam"], int(w["start_sec"]))
        for w in ours.windows
    ]
    assert our_keys == ref_keys  # fully deterministic: exact order parity

    for i in range(len(ours)):
        o, r = ours[i], ref[i]
        ctx = f"{split} distill={distill} win={our_keys[i]}"
        for k in KEYS:
            assert (k in o) == (k in r), f"{ctx}: {k} presence"
            if k not in r:
                continue
            a = np.asarray(o[k], np.float64)
            b = np.asarray(
                r[k].numpy() if hasattr(r[k], "numpy") else r[k], np.float64
            )
            assert a.shape == b.shape, f"{ctx}: {k} {a.shape} vs {b.shape}"
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=f"{ctx}: {k}")
        mo, mr = o["metadata"], r["metadata"]
        for k in ("narrations", "video_id", "exo_camera", "per_second_views"):
            assert list(np.atleast_1d(mo[k])) == list(np.atleast_1d(mr[k])), (
                f"{ctx}: metadata.{k}"
            )

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

# world + our-side loader constructor live in tests/world_lemma.py so the
# data-layer golden fixture freezes EXACTLY this world
from tests import world_lemma as WL

FPS, DUR, HOP, VDIM, NDIM = WL.FPS, WL.DUR, WL.HOP, WL.VDIM, WL.NDIM


def _load_ref_cls():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    for p in (REF_ROOT, os.path.join(REF_ROOT, "data")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from data.loader_lemma import LemmaDataLoader

    return LemmaDataLoader


@pytest.fixture(scope="module")
def ref_cls():
    return _load_ref_cls()


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    return WL.build_lemma_world(tmp_path_factory.mktemp("lemma_world"))


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


_our_loader = WL.make_our_loader

KEYS = WL.COMPARE_KEYS


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
        for k in WL.META_KEYS:
            assert list(np.atleast_1d(mo[k])) == list(np.atleast_1d(mr[k])), (
                f"{ctx}: metadata.{k}"
            )

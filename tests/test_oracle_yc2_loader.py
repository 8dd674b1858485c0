"""Item-level protocol parity for the YouCook2 feature dataset.

Runs the reference's ACTUAL ``YouCook2_Feature`` (torch, from
/root/reference/eval/eval_zeroshot_retrieval.py:29-153, via ``__new__`` —
its ``__init__`` hardcodes the cluster annotation root) against our
``data/youcook2.py::YouCook2Dataset``: the num_clips linspace window
placement, adaptive (seq_len == -1) covering-vs-inside logic with
start_idx/end_idx trim spans, frame-index clipping, and fixed-seq_len mode —
all deterministic, compared exactly on shared synthetic features.
"""

import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"
REF_EVAL = os.path.join(REF_ROOT, "eval", "eval_zeroshot_retrieval.py")

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isfile(REF_EVAL),
                       reason="reference not mounted"),
]

VDIM = 6


@pytest.fixture(scope="module")
def ref_cls():
    import importlib.util

    sys.path.insert(0, REF_ROOT)
    try:
        spec = importlib.util.spec_from_file_location("ref_yc2_mod", REF_EVAL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_ROOT)
    return mod.YouCook2_Feature


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    import torch

    root = tmp_path_factory.mktemp("yc2_world")
    r = np.random.RandomState(13)
    # segments chosen to hit BOTH adaptive branches: short segments
    # (chosen_vlen = clip(2*dur, 32, 256) >= dur -> covering windows) and a
    # very long one (dur > 256 -> windows inside the segment)
    anno = {
        "vidA": {"annotations": [
            {"segment": [5, 17], "sentence": "add the flour"},  # ints: the youcookii json stores integer seconds and the reference indexes with them unconverted
            {"segment": [40, 350], "sentence": "long baking montage"},
        ]},
        "vidB": {"annotations": [
            {"segment": [2, 60], "sentence": "mix everything"},
        ]},
    }
    vlens = {"vidA": 400, "vidB": 90}
    feats, vid2path = {}, {}
    for vid, vlen in vlens.items():
        feats[vid] = r.randn(vlen, VDIM).astype(np.float32)
        d = root / "src" / vid
        d.mkdir(parents=True)
        torch.save(torch.from_numpy(feats[vid]),
                   root / f"{vid}_{vid}.pth.tar")
        vid2path[vid] = f"x/{vid}/file"
    return {"root": str(root), "anno": anno, "vlens": vlens, "feats": feats,
            "vid2path": vid2path}


def _ref_loader(ref_cls, world, num_clips, seq_len):
    obj = ref_cls.__new__(ref_cls)
    obj.mode = "val"
    obj.num_clips = num_clips
    obj.seq_len = seq_len
    obj.vid2path = world["vid2path"]
    obj.video_feature_path = world["root"]
    obj.vlen_dict = {v: [l, l] for v, l in world["vlens"].items()}
    obj.anno = world["anno"]
    obj.video_info = [
        {"vid": vid, **seg}
        for vid in sorted(world["anno"])
        for seg in world["anno"][vid]["annotations"]
    ]
    return obj


def _our_loader(world, num_clips, seq_len):
    from exoground_tpu.data.io import FeatureStore
    from exoground_tpu.data.youcook2 import YouCook2Config, YouCook2Dataset

    return YouCook2Dataset(
        YouCook2Config(num_clips=num_clips, seq_len=seq_len),
        FeatureStore(mem=world["feats"]),
        world["anno"],
        half_val=False,  # the reference eval class has no half split
    )


@pytest.mark.parametrize("num_clips,seq_len", [
    (10, -1),  # the eval protocol config (test_retrieval_yc2:162)
    (4, -1),
    (4, 32),   # fixed-window mode
])
def test_yc2_items_match_reference(ref_cls, world, num_clips, seq_len):
    ref = _ref_loader(ref_cls, world, num_clips, seq_len)
    ours = _our_loader(world, num_clips, seq_len)
    assert len(ref) == len(ours)
    saw_inside_branch = False
    for i in range(len(ref)):
        r, o = ref[i], ours[i]
        ctx = f"clips={num_clips} seq={seq_len} i={i}"
        np.testing.assert_allclose(
            np.asarray(o["video"], np.float64),
            np.asarray(r["video"].numpy(), np.float64), err_msg=ctx,
        )
        assert str(o["str"]) == str(r["str"]), ctx
        assert float(o["start"]) == float(r["start"]), ctx
        assert float(o["end"]) == float(r["end"]), ctx
        if seq_len == -1:
            np.testing.assert_array_equal(
                np.asarray(o["start_idx"]), np.asarray(r["start_idx"]),
                err_msg=ctx)
            np.testing.assert_array_equal(
                np.asarray(o["end_idx"]), np.asarray(r["end_idx"]),
                err_msg=ctx)
            if float(r["end"]) - float(r["start"]) > 256:
                saw_inside_branch = True
    if seq_len == -1:
        assert saw_inside_branch  # the dur>chosen_vlen branch was exercised

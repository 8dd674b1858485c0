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

# world + our-side loader constructor live in tests/world_yc2.py so the
# data-layer golden fixture freezes EXACTLY this world
from tests import world_yc2 as WY

VDIM = WY.VDIM


def _load_ref_cls():
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
def ref_cls():
    return _load_ref_cls()


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    return WY.build_yc2_world(tmp_path_factory.mktemp("yc2_world"))


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


_our_loader = WY.make_our_loader


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

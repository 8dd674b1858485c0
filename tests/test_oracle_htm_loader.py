"""Item-level protocol parity for the HowTo100M feature loader.

Runs the reference's ACTUAL ``HTM_FeatureLoader`` (torch, from
/root/reference/data/loader_htm.py, via ``__new__`` — its ``__init__``
hardcodes the cluster feature root and reads repo-local helper csvs, one of
which is a missing large blob) against our ``data/htm.py::HTMFeatureDataset``
on a shared synthetic world: .mp4.npy/.webm.npy feature files + an in-memory
htm-370k-style ASR dict consumed verbatim by both sides.

The random window anchor is numpy on both sides (reference: global
``np.random.choice``, loader_htm.py:192; ours: per-index RandomState) — the
test pins them to the same MT19937 stream per item, which is exact when the
candidate arrays match. The world avoids the reference's
filtered-index-vs-iloc quirk (loader_htm.py:190-194 selects an index LABEL
from the end<vlen-filtered frame but anchors with ``.iloc``; with any row
dropped the label no longer equals the position) by keeping every caption
end < vlen — the common case; our loader works in positions throughout.

Both tokenizers are Word2VecTokenizers over the same vocab (token math
oracle-tested in test_oracle_sampler.py), so the reference's
isinstance-gated all-stop-words break (loader_htm.py:221) engages on both
sides.
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

# worlds + our-side loader constructors live in tests/world_htm.py so the
# data-layer golden fixture freezes EXACTLY these worlds
from tests import world_htm as WH

DUR = WH.DUR
VDIM = WH.VDIM
VOCAB = WH.VOCAB


def _load_ref_mod():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    for p in (REF_ROOT, os.path.join(REF_ROOT, "data"),
              os.path.join(REF_ROOT, "model")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from data import loader_htm

    return loader_htm


@pytest.fixture(scope="module")
def ref_mod():
    return _load_ref_mod()


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    return WH.build_htm_world(tmp_path_factory.mktemp("htm_world"))


def _ref_tokenizer():
    import word2vec_model as ref_w2v

    tok = ref_w2v.Word2VecTokenizer.__new__(ref_w2v.Word2VecTokenizer)
    tok.word_to_token = dict(VOCAB)
    tok.token_to_word = {v: k for k, v in VOCAB.items()}
    tok.max_words = WH.TOKEN_LEN
    return tok


def _ref_loader(ref_mod, world, mode="val"):
    obj = ref_mod.HTM_FeatureLoader.__new__(ref_mod.HTM_FeatureLoader)
    obj.video_feature_path = world["root"]
    obj.text_tag = "htm-370k"  # caption dicts consumed in-memory (:176)
    obj.mode = mode
    obj.tokenizer = _ref_tokenizer()
    obj.duration = DUR
    obj.trim_ratio = 0.1
    obj.vid_to_asr_dict = world["asr"]
    obj.video_info = sorted(world["asr"].keys())
    return obj


_our_loader = WH.make_our_loader


def test_htm_items_match_reference(ref_mod, world):
    ref = _ref_loader(ref_mod, world)
    ours = _our_loader(world)
    assert ref.video_info == ours.video_info

    for i, vid in enumerate(ref.video_info):
        seed = 900 + i
        np.random.seed(seed)  # reference anchor draw (global np.random)
        r = ref[i]
        ours._rng = lambda idx, s=seed: np.random.RandomState(s)
        o = ours[i]

        ctx = f"vid={vid}"
        assert o["_texts"]["text"] == r["text"], ctx
        np.testing.assert_allclose(o["_texts"]["start"], r["start"],
                                   err_msg=ctx)
        np.testing.assert_allclose(o["_texts"]["end"], r["end"], err_msg=ctx)
        np.testing.assert_allclose(
            np.stack(o["_texts"]["token"]),
            np.asarray(r["token"].numpy()), err_msg=ctx,
        )
        np.testing.assert_allclose(
            np.asarray(o["_video"], np.float64),
            np.asarray(r["video"].numpy(), np.float64), atol=0, err_msg=ctx,
        )
        np.testing.assert_allclose(o["abs_text_start"], r["abs_text_start"],
                                   atol=1e-7, err_msg=ctx)
        np.testing.assert_allclose(o["abs_text_end"], r["abs_text_end"],
                                   atol=1e-7, err_msg=ctx)
        # val/test mode exposes the cut window (loader_htm.py:170-171)
        assert int(o["cut_start"]) == int(r["cut_start"]), ctx
        assert int(o["cut_end"]) == int(r["cut_end"]), ctx


def test_htm_anchor_distribution_matches(ref_mod, world):
    """Same seed -> same anchor over many draws (the candidate arrays and the
    MT19937 stream must both line up, not just one lucky draw)."""
    ref = _ref_loader(ref_mod, world)
    ours = _our_loader(world)
    hit_break_after_accumulate = False
    for vid in ("vid_norm", "vid_stop"):
        i = ref.video_info.index(vid)
        for seed in range(40):
            np.random.seed(seed)
            r = ref[i]
            ours._rng = lambda idx, s=seed: np.random.RandomState(s)
            o = ours[i]
            assert int(o["cut_start"]) == int(r["cut_start"]), (vid, seed)
            assert o["_texts"]["text"] == r["text"], (vid, seed)
            if vid == "vid_stop" and o["_texts"]["text"][0] != "[UNK]":
                # anchored before the stop-word sentence: accumulated then
                # broke at it — the loader_htm.py:221 branch, non-vacuously
                hit_break_after_accumulate = True
    assert hit_break_after_accumulate

# ------------------------------------------------- HTM_Align window protocol

ALIGN_ANNO = WH.ALIGN_ANNO


def _ref_align_loader(ref_mod, world_align_root):
    from data import loader_htm_align

    obj = loader_htm_align.HTM_Align.__new__(loader_htm_align.HTM_Align)
    obj.video_feature_path = world_align_root
    obj.tokenizer = _ref_tokenizer()
    obj.duration = DUR
    obj.anno = ALIGN_ANNO
    obj.video_info = sorted(ALIGN_ANNO.keys())
    return obj


def test_htm_align_window_items_match_reference(ref_mod, tmp_path):
    align_root = WH.build_align_world(tmp_path)
    ref = _ref_align_loader(ref_mod, align_root)
    ours = WH.make_our_align_loader(align_root)
    assert ref.video_info == ours.video_info

    saw_zero_width = False
    for i, vid in enumerate(ref.video_info):
        for seed in range(30):
            np.random.seed(seed)
            rit = ref[i]
            # pin our per-index RandomState to the same MT19937 stream
            with WH.pinned_align_rng(ours, seed):
                ours_item = ours[i]
            ctx = (vid, seed)
            assert ours_item["_texts"]["text"] == rit["text"], ctx
            np.testing.assert_allclose(
                ours_item["_texts"]["start"], rit["start"], err_msg=str(ctx))
            np.testing.assert_allclose(
                ours_item["_texts"]["end"], rit["end"], err_msg=str(ctx))
            assert ours_item["_texts"]["aligned"] == rit["align"], ctx
            np.testing.assert_allclose(
                np.stack(ours_item["_texts"]["token"]),
                np.stack([t.numpy() for t in rit["token"]]), err_msg=str(ctx))
            np.testing.assert_allclose(
                np.asarray(ours_item["_video"], np.float64),
                np.asarray(rit["video"].numpy(), np.float64),
                err_msg=str(ctx))
            if any(s == e for s, e in zip(rit["start"], rit["end"])):
                saw_zero_width = True
    assert saw_zero_width  # the loader_htm_align no-trim-break edge occurred

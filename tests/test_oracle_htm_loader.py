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

DUR = 16
VDIM = 8
VOCAB = {w: i + 1 for i, w in enumerate(
    "add the flour mix well stir pour water slice bread wait now done".split()
)}


@pytest.fixture(scope="module")
def ref_mod():
    from tests._oracle_utils import stub_missing_modules

    stub_missing_modules()
    for p in (REF_ROOT, os.path.join(REF_ROOT, "data"),
              os.path.join(REF_ROOT, "model")):
        if p not in sys.path:
            sys.path.insert(0, p)
    from data import loader_htm

    return loader_htm


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("htm_world")
    r = np.random.RandomState(3)

    def caps(specs):
        return {"text": [t for t, _, _ in specs],
                "start": [float(s) for _, s, _ in specs],
                "end": [float(e) for _, _, e in specs]}

    asr = {
        # normal video: several candidate anchors, sentences crossing the
        # window end (trim), one >window sentence (break)
        "vid_norm": caps([
            ("add the flour", 1.2, 4.8), ("mix well now", 5.1, 9.7),
            ("stir and wait", 10.4, 14.2), ("pour water", 15.0, 19.6),
            ("slice the bread", 21.3, 26.0), ("well done", 28.5, 33.9),
            ("add water now", 40.2, 44.0),
        ]),
        # all-stop-words sentence mid-stream: the accumulation loop must
        # BREAK there on both sides (loader_htm.py:221)
        "vid_stop": caps([
            ("mix the flour", 0.8, 3.9), ("zzz qqq xxx", 4.4, 7.2),
            ("stir well", 8.1, 12.5), ("pour now", 14.0, 18.9),
            ("slice bread", 22.0, 27.5), ("done now", 30.0, 34.0),
        ]),
        # no candidate anchor (every start >= last_end - duration):
        # '[UNK]' fallback window [0, duration)
        "vid_unk": caps([
            ("add flour", 30.0, 33.0), ("mix well", 34.0, 36.5),
        ]),
        # webm-suffix fallback (loader_htm.py:141-144)
        "vid_webm": caps([
            ("wait now", 0.5, 3.5), ("stir the water", 4.2, 8.8),
            ("slice it well", 9.5, 13.0), ("bread done", 15.5, 19.0),
            ("pour more water", 22.0, 26.0), ("mix done", 29.0, 34.0),
        ]),
    }
    feats = {}
    for vid in asr:
        vlen = 40
        feats[vid] = r.randn(vlen, VDIM).astype(np.float32)
        sfx = ".webm.npy" if vid == "vid_webm" else ".mp4.npy"
        np.save(str(root / f"{vid}{sfx}"), feats[vid])
    return {"root": str(root), "asr": asr, "feats": feats}


def _ref_loader(ref_mod, world, mode="val"):
    import word2vec_model as ref_w2v

    tok = ref_w2v.Word2VecTokenizer.__new__(ref_w2v.Word2VecTokenizer)
    tok.word_to_token = dict(VOCAB)
    tok.token_to_word = {v: k for k, v in VOCAB.items()}
    tok.max_words = 32

    obj = ref_mod.HTM_FeatureLoader.__new__(ref_mod.HTM_FeatureLoader)
    obj.video_feature_path = world["root"]
    obj.text_tag = "htm-370k"  # caption dicts consumed in-memory (:176)
    obj.mode = mode
    obj.tokenizer = tok
    obj.duration = DUR
    obj.trim_ratio = 0.1
    obj.vid_to_asr_dict = world["asr"]
    obj.video_info = sorted(world["asr"].keys())
    return obj


def _our_loader(world, mode="val"):
    from exoground_tpu.data.htm import HTMConfig, HTMFeatureDataset
    from exoground_tpu.models.word2vec import Word2VecTokenizer

    cfg = HTMConfig(video_feature_root=world["root"], duration=DUR,
                    token_len=32, text_bucket=8)
    ds = HTMFeatureDataset(
        cfg, Word2VecTokenizer(dict(VOCAB), max_words=32), mode=mode,
        asr=world["asr"],
    )
    # mode split: 5% of 4 vids -> 0 val items via the init formula; pin the
    # item list to all vids on both sides so every world case is exercised
    ds.video_info = sorted(world["asr"].keys())
    return ds


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

ALIGN_ANNO = {
    # [aligned, start, end, text]; includes a zero-width-after-trim segment:
    # anchor at 9.4 -> start_ts = ceil(9.4) = 10; the 8.6-9.8 sentence rounds
    # to [9, 10] (e-s=1 passes) but trims to [0, 0] — the reference APPENDS
    # the zero-width segment (loader_htm_align.py:112-137 has no trim break)
    "avid_norm": [
        [1, 1.3, 4.9, "add the flour"], [0, 5.2, 9.1, "mix well now"],
        [1, 9.4, 14.3, "stir and wait"], [0, 15.1, 19.8, "pour water"],
        [1, 21.0, 25.7, "slice the bread"], [0, 28.2, 33.5, "well done"],
        [1, 38.5, 39.9, "add water"],
    ],
    "avid_edge": [
        # anchor at 9.4 -> start_ts = ceil(9.4) = 10; (9.4, 9.9) rounds to
        # [9, 10] (e-s = 1 passes) and trims to [0, 0]: zero-width appended
        [0, 2.1, 6.0, "mix the water"], [1, 9.4, 9.9, "stir it"],
        [0, 9.4, 13.2, "pour the water"], [1, 14.8, 18.4, "slice bread"],
        [0, 20.5, 24.0, "wait now"], [1, 27.0, 32.0, "bread done now"],
    ],
}


def _ref_align_loader(ref_mod, world_align_root):
    import word2vec_model as ref_w2v
    from data import loader_htm_align

    tok = ref_w2v.Word2VecTokenizer.__new__(ref_w2v.Word2VecTokenizer)
    tok.word_to_token = dict(VOCAB)
    tok.token_to_word = {v: k for k, v in VOCAB.items()}
    tok.max_words = 32

    obj = loader_htm_align.HTM_Align.__new__(loader_htm_align.HTM_Align)
    obj.video_feature_path = world_align_root
    obj.tokenizer = tok
    obj.duration = DUR
    obj.anno = ALIGN_ANNO
    obj.video_info = sorted(ALIGN_ANNO.keys())
    return obj


def test_htm_align_window_items_match_reference(ref_mod, tmp_path):
    from exoground_tpu.data.htm import HTMAlignDataset, HTMConfig
    from exoground_tpu.models.word2vec import Word2VecTokenizer

    r = np.random.RandomState(5)
    for vid in ALIGN_ANNO:
        np.save(str(tmp_path / f"{vid}.mp4.npy"),
                r.randn(42, VDIM).astype(np.float32))

    ref = _ref_align_loader(ref_mod, str(tmp_path))
    cfg = HTMConfig(video_feature_root=str(tmp_path), duration=DUR,
                    token_len=32, text_bucket=8)
    ours = HTMAlignDataset(
        cfg, Word2VecTokenizer(dict(VOCAB), max_words=32), mode="window",
        anno=ALIGN_ANNO,
    )
    assert ref.video_info == ours.video_info

    saw_zero_width = False
    for i, vid in enumerate(ref.video_info):
        for seed in range(30):
            np.random.seed(seed)
            rit = ref[i]
            # pin our per-index RandomState to the same MT19937 stream
            import exoground_tpu.data.htm as htm_mod
            orig = np.random.RandomState
            ours_item = None
            try:
                ours.cfg.seed = 0
                real_rs = np.random.RandomState

                class Pinned(real_rs):
                    def __init__(self, _ignored=None):
                        super().__init__(seed)

                htm_mod.np.random.RandomState = Pinned
                ours_item = ours[i]
            finally:
                htm_mod.np.random.RandomState = orig
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

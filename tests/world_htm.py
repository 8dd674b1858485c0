"""Deterministic synthetic HowTo100M worlds (feature loader + HTM-Align),
shared by the reference oracle parity tests (tests/test_oracle_htm_loader.py)
and the self-contained data-layer golden fixtures. The feature files
regenerate bit-exactly from fixed numpy seeds; the ASR/annotation dicts are
literals here.

The reference draws its window anchor from GLOBAL numpy RNG
(loader_htm.py:192, loader_htm_align.py:96) — fixture generation seeds
np.random before each item, and the golden/oracle tests pin our per-index
RandomState to the same MT19937 stream, which is exact when the candidate
arrays match.
"""

import numpy as np

DUR = 16
VDIM = 8
TOKEN_LEN = 32
VOCAB = {w: i + 1 for i, w in enumerate(
    "add the flour mix well stir pour water slice bread wait now done".split()
)}

# seeds frozen per item in the golden fixture (anchor-draw variety: several
# distinct anchors per video, incl. the accumulate-then-break case)
GOLDEN_SEEDS = tuple(range(10))


def _caps(specs):
    return {"text": [t for t, _, _ in specs],
            "start": [float(s) for _, s, _ in specs],
            "end": [float(e) for _, _, e in specs]}


ASR = {
    # normal video: several candidate anchors, sentences crossing the
    # window end (trim), one >window sentence (break)
    "vid_norm": _caps([
        ("add the flour", 1.2, 4.8), ("mix well now", 5.1, 9.7),
        ("stir and wait", 10.4, 14.2), ("pour water", 15.0, 19.6),
        ("slice the bread", 21.3, 26.0), ("well done", 28.5, 33.9),
        ("add water now", 40.2, 44.0),
    ]),
    # all-stop-words sentence mid-stream: the accumulation loop must
    # BREAK there on both sides (loader_htm.py:221)
    "vid_stop": _caps([
        ("mix the flour", 0.8, 3.9), ("zzz qqq xxx", 4.4, 7.2),
        ("stir well", 8.1, 12.5), ("pour now", 14.0, 18.9),
        ("slice bread", 22.0, 27.5), ("done now", 30.0, 34.0),
    ]),
    # no candidate anchor (every start >= last_end - duration):
    # '[UNK]' fallback window [0, duration)
    "vid_unk": _caps([
        ("add flour", 30.0, 33.0), ("mix well", 34.0, 36.5),
    ]),
    # webm-suffix fallback (loader_htm.py:141-144)
    "vid_webm": _caps([
        ("wait now", 0.5, 3.5), ("stir the water", 4.2, 8.8),
        ("slice it well", 9.5, 13.0), ("bread done", 15.5, 19.0),
        ("pour more water", 22.0, 26.0), ("mix done", 29.0, 34.0),
    ]),
}

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


def build_htm_world(root):
    """Feature-loader world: .mp4.npy/.webm.npy files + the in-memory ASR
    dict. ``root`` is a pathlib.Path of an existing empty directory."""
    r = np.random.RandomState(3)
    feats = {}
    for vid in ASR:
        vlen = 40
        feats[vid] = r.randn(vlen, VDIM).astype(np.float32)
        sfx = ".webm.npy" if vid == "vid_webm" else ".mp4.npy"
        np.save(str(root / f"{vid}{sfx}"), feats[vid])
    return {"root": str(root), "asr": ASR, "feats": feats}


def build_align_world(root):
    """HTM-Align window-mode world: .mp4.npy files for the ALIGN_ANNO vids."""
    r = np.random.RandomState(5)
    for vid in ALIGN_ANNO:
        np.save(str(root / f"{vid}.mp4.npy"),
                r.randn(42, VDIM).astype(np.float32))
    return str(root)


def make_our_loader(world, mode="val"):
    from exoground_tpu.data.htm import HTMConfig, HTMFeatureDataset
    from exoground_tpu.models.word2vec import Word2VecTokenizer

    cfg = HTMConfig(video_feature_root=world["root"], duration=DUR,
                    token_len=TOKEN_LEN, text_bucket=8)
    ds = HTMFeatureDataset(
        cfg, Word2VecTokenizer(dict(VOCAB), max_words=TOKEN_LEN), mode=mode,
        asr=world["asr"],
    )
    # mode split: 5% of 4 vids -> 0 val items via the init formula; pin the
    # item list to all vids on both sides so every world case is exercised
    ds.video_info = sorted(world["asr"].keys())
    return ds


def make_our_align_loader(align_root):
    from exoground_tpu.data.htm import HTMAlignDataset, HTMConfig
    from exoground_tpu.models.word2vec import Word2VecTokenizer

    cfg = HTMConfig(video_feature_root=align_root, duration=DUR,
                    token_len=TOKEN_LEN, text_bucket=8)
    return HTMAlignDataset(
        cfg, Word2VecTokenizer(dict(VOCAB), max_words=TOKEN_LEN),
        mode="window", anno=ALIGN_ANNO,
    )


import contextlib


@contextlib.contextmanager
def pinned_align_rng(ours, seed):
    """Pin our HTMAlignDataset's per-index anchor RNG to one MT19937 stream
    (the reference's anchor draw rides GLOBAL np.random, seeded by the
    caller). Patches only this instance's ``_rng`` hook — no module or
    class-global state is touched — and restores it on exit."""
    ours._rng = lambda idx, s=seed: np.random.RandomState(s)
    try:
        yield
    finally:
        del ours._rng  # fall back to the class method

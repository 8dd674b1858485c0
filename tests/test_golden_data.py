"""Self-contained data-layer regression against committed golden fixtures.

Like tests/test_golden.py but for the data loaders: the fixtures freeze the
REFERENCE loader classes' items over the deterministic synthetic worlds
(tests/world_egoexo.py), generated once by
exoground_tpu/tools/gen_golden_fixtures.py. Protocol drift in
data/egoexo4d.py (window precompute, feature slicing, rank targets,
multi-view stitching, center/duration labels, ...) fails here WITHOUT
/root/reference mounted. torch/pandas are needed only to materialize the
synthetic world's .pt feature files — both are baked into the environment.

Reference row order is filesystem-dependent (precompute listdirs), so items
are matched by window key exactly like the oracle tests do.
"""

import os

import numpy as np
import pytest

from tests import golden_common as G
from tests import world_egoexo as W

pytestmark = pytest.mark.slow  # integration tier (world build + torch import)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    return W.build_egoexo_world(tmp_path_factory.mktemp("egoexo_golden"))


@pytest.fixture(scope="module")
def fixture():
    # gate only the EgoExo tests on this file — the HTM/LEMMA/YC2 tests have
    # their own fixture files and skip independently
    path = os.path.join(G.GOLDEN_DIR, "egoexo_loader.npz")
    if not os.path.isfile(path):
        pytest.skip("golden fixture egoexo_loader.npz not generated")
    return np.load(path)


def _positions_by_key(stored_keys):
    by_key = {}
    for pos, k in enumerate(stored_keys):
        by_key.setdefault(str(k), []).append(pos)
    return by_key


@pytest.mark.parametrize("tag", sorted(W.GOLDEN_CONFIGS))
def test_golden_egoexo_items(world, fixture, tag):
    z = fixture
    ours = W.make_our_loader(world, **dict(W.GOLDEN_CONFIGS[tag]))
    our_keys = ["|".join(map(str, W.window_key(w))) for w in ours.windows]
    stored = [str(k) for k in z[f"{tag}::keys"]]
    assert sorted(our_keys) == sorted(stored), f"{tag}: window multiset"

    by_key = _positions_by_key(stored)
    fields = set(z.files)
    for i, key in enumerate(our_keys):
        pos = by_key[key].pop(0)
        item = ours[i]
        kid = f"{tag}::{pos}"
        for k in W.COMPARE_KEYS:
            fid = f"{kid}::{k}"
            if fid in fields:
                assert k in item, f"{fid}: missing in ours"
                np.testing.assert_allclose(
                    np.asarray(item[k], np.float64),
                    z[fid].astype(np.float64), atol=1e-6, err_msg=fid,
                )
            else:
                assert k not in item, f"{fid}: extra in ours"
        md = item["metadata"]
        for k in W.META_KEYS:
            got = [str(x) for x in np.atleast_1d(md[k])]
            want = [str(x) for x in z[f"{kid}::meta.{k}"]]
            assert got == want, f"{kid}: metadata.{k}"
        assert int(md["start_sec"]) == int(z[f"{kid}::meta.start_sec"]), kid


def test_golden_egoexo_tan_items(world, fixture):
    z = fixture
    ours = W.make_our_tan_loader(world)
    our_keys = ["|".join(map(str, W.window_key(w))) for w in ours.windows]
    stored = [str(k) for k in z["tan::keys"]]
    assert sorted(our_keys) == sorted(stored)

    by_key = _positions_by_key(stored)
    for i, key in enumerate(our_keys):
        pos = by_key[key].pop(0)
        item = ours[i]
        kid = f"tan::{pos}"
        for k in ("video", "padding_mask", "narration_features",
                  "narration_padding_mask", "start", "end"):
            np.testing.assert_allclose(
                np.asarray(item[k], np.float64),
                z[f"{kid}::{k}"].astype(np.float64), atol=1e-6,
                err_msg=f"{kid}::{k}",
            )
        got = [str(x) for x in item["metadata"]["narrations"]]
        want = [str(x) for x in z[f"{kid}::meta.narrations"]]
        assert got == want, kid


# ------------------------------------------------- HowTo100M loader goldens

from tests import world_htm as WH

_HTM_FIXTURE = os.path.join(G.GOLDEN_DIR, "htm_loader.npz")


@pytest.fixture(scope="module")
def htm_fixture():
    if not os.path.isfile(_HTM_FIXTURE):
        pytest.skip("htm_loader.npz not generated")
    return np.load(_HTM_FIXTURE)


def test_golden_htm_feature_items(tmp_path, htm_fixture):
    """HTM_FeatureLoader protocol (loader_htm.py:62-257) against frozen
    reference items: anchor draw, sentence accumulation/trim/break incl. the
    all-stop-words break, tokenization, window cut."""
    z = htm_fixture
    world = WH.build_htm_world(tmp_path)
    ours = WH.make_our_loader(world)
    assert list(ours.video_info) == [str(v) for v in z["feat::vids"]]

    for i, vid in enumerate(ours.video_info):
        for seed in WH.GOLDEN_SEEDS:
            ours._rng = lambda idx, s=seed: np.random.RandomState(s)
            o = ours[i]
            kid = f"feat::{vid}::{seed}"
            assert o["_texts"]["text"] == [str(t) for t in z[f"{kid}::text"]], kid
            np.testing.assert_allclose(
                o["_texts"]["start"], z[f"{kid}::start"], err_msg=kid)
            np.testing.assert_allclose(
                o["_texts"]["end"], z[f"{kid}::end"], err_msg=kid)
            np.testing.assert_array_equal(
                np.stack(o["_texts"]["token"]), z[f"{kid}::token"], err_msg=kid)
            np.testing.assert_allclose(
                np.asarray(o["_video"], np.float64),
                z[f"{kid}::video"].astype(np.float64), atol=0, err_msg=kid)
            np.testing.assert_allclose(
                o["abs_text_start"], z[f"{kid}::abs_text_start"],
                atol=1e-7, err_msg=kid)
            np.testing.assert_allclose(
                o["abs_text_end"], z[f"{kid}::abs_text_end"],
                atol=1e-7, err_msg=kid)
            assert int(o["cut_start"]) == int(z[f"{kid}::cut_start"]), kid
            assert int(o["cut_end"]) == int(z[f"{kid}::cut_end"]), kid


def test_golden_htm_align_items(tmp_path, htm_fixture):
    """HTM_Align window protocol (loader_htm_align.py:38-164) against frozen
    reference items, incl. the no-trim-break zero-width-segment quirk."""
    z = htm_fixture
    align_root = WH.build_align_world(tmp_path)
    ours = WH.make_our_align_loader(align_root)
    assert list(ours.video_info) == [str(v) for v in z["align::vids"]]

    saw_zero_width = False
    for i, vid in enumerate(ours.video_info):
        for seed in WH.GOLDEN_SEEDS:
            with WH.pinned_align_rng(ours, seed):
                o = ours[i]
            kid = f"align::{vid}::{seed}"
            assert o["_texts"]["text"] == [str(t) for t in z[f"{kid}::text"]], kid
            np.testing.assert_allclose(
                o["_texts"]["start"], z[f"{kid}::start"], err_msg=kid)
            np.testing.assert_allclose(
                o["_texts"]["end"], z[f"{kid}::end"], err_msg=kid)
            np.testing.assert_array_equal(
                np.asarray(o["_texts"]["aligned"]), z[f"{kid}::aligned"],
                err_msg=kid)
            np.testing.assert_array_equal(
                np.stack(o["_texts"]["token"]), z[f"{kid}::token"],
                err_msg=kid)
            np.testing.assert_allclose(
                np.asarray(o["_video"], np.float64),
                z[f"{kid}::video"].astype(np.float64), err_msg=kid)
            starts, ends = z[f"{kid}::start"], z[f"{kid}::end"]
            if any(s == e for s, e in zip(starts, ends)):
                saw_zero_width = True
    assert saw_zero_width  # the loader_htm_align no-trim-break edge occurred


# ----------------------------------------------------- LEMMA loader goldens

from tests import world_lemma as WL

_LEMMA_FIXTURE = os.path.join(G.GOLDEN_DIR, "lemma_loader.npz")


@pytest.fixture(scope="module")
def lemma_fixture():
    if not os.path.isfile(_LEMMA_FIXTURE):
        pytest.skip("lemma_loader.npz not generated")
    return np.load(_LEMMA_FIXTURE)


@pytest.fixture(scope="module")
def lemma_world(tmp_path_factory):
    return WL.build_lemma_world(tmp_path_factory.mktemp("lemma_golden"))


@pytest.mark.parametrize("tag", sorted(WL.GOLDEN_CONFIGS))
def test_golden_lemma_items(lemma_world, lemma_fixture, tag):
    """LemmaDataLoader protocol (loader_lemma.py) against frozen reference
    items — window precompute, test-split ego-as-exo rows, distill targets."""
    z = lemma_fixture
    split, distill = WL.GOLDEN_CONFIGS[tag]
    ours = WL.make_our_loader(lemma_world, split, use_distill_nce_loss=distill)
    our_keys = ["|".join(map(str, WL.window_key(w))) for w in ours.windows]
    stored = [str(k) for k in z[f"{tag}::keys"]]
    assert our_keys == stored, f"{tag}: window order"  # fully deterministic

    for pos in range(len(our_keys)):
        item = ours[pos]
        kid = f"{tag}::{pos}"
        for k in WL.COMPARE_KEYS:
            fid = f"{kid}::{k}"
            if fid in z.files:
                assert k in item, f"{fid}: missing in ours"
                np.testing.assert_allclose(
                    np.asarray(item[k], np.float64),
                    z[fid].astype(np.float64), atol=1e-6, err_msg=fid,
                )
            else:
                assert k not in item, f"{fid}: extra in ours"
        md = item["metadata"]
        for k in WL.META_KEYS:
            got = [str(x) for x in np.atleast_1d(md[k])]
            want = [str(x) for x in z[f"{kid}::meta.{k}"]]
            assert got == want, f"{kid}: metadata.{k}"


# -------------------------------------------------- YouCook2 loader goldens

from tests import world_yc2 as WY

_YC2_FIXTURE = os.path.join(G.GOLDEN_DIR, "yc2_loader.npz")


@pytest.fixture(scope="module")
def yc2_fixture():
    if not os.path.isfile(_YC2_FIXTURE):
        pytest.skip("yc2_loader.npz not generated")
    return np.load(_YC2_FIXTURE)


@pytest.mark.parametrize("tag", sorted(WY.GOLDEN_CONFIGS))
def test_golden_yc2_items(yc2_fixture, tag):
    """YouCook2_Feature protocol (eval_zeroshot_retrieval.py:29-153) against
    frozen reference items — linspace windows, adaptive trim spans, clipping.
    Needs no torch: our loader reads the in-memory world."""
    z = yc2_fixture
    num_clips, seq_len = WY.GOLDEN_CONFIGS[tag]
    world = WY.build_yc2_world()
    ours = WY.make_our_loader(world, num_clips, seq_len)
    assert len(ours) == int(z[f"{tag}::n"])

    for i in range(len(ours)):
        o = ours[i]
        kid = f"{tag}::{i}"
        np.testing.assert_allclose(
            np.asarray(o["video"], np.float64),
            z[f"{kid}::video"].astype(np.float64), err_msg=kid,
        )
        assert str(o["str"]) == str(z[f"{kid}::str"]), kid
        assert float(o["start"]) == float(z[f"{kid}::start"]), kid
        assert float(o["end"]) == float(z[f"{kid}::end"]), kid
        if seq_len == -1:
            np.testing.assert_array_equal(
                np.asarray(o["start_idx"]), z[f"{kid}::start_idx"],
                err_msg=kid)
            np.testing.assert_array_equal(
                np.asarray(o["end_idx"]), z[f"{kid}::end_idx"], err_msg=kid)

"""Data layer tests: samplers, collate, pipelines, all dataset families."""

import numpy as np
import pytest

from exoground_tpu.data import (
    CurriculumShardedSampler,
    EgoExo4DDataset,
    EgoExo4DTANDataset,
    EgoExoConfig,
    EgoExoSource,
    FeatureStore,
    HTMAlignDataset,
    HTMConfig,
    HTMFeatureDataset,
    LemmaConfig,
    LemmaDataset,
    ShardedSampler,
    ThreadedLoader,
    YouCook2Config,
    YouCook2Dataset,
    camera_view_order,
    get_phase,
    pad_by_last,
)
from exoground_tpu.data.collate import stack_texts, stack_videos
from exoground_tpu.data.pipeline import BackgroundIterator


class DummyTokenizer:
    def __call__(self, text, **kw):
        if isinstance(text, str):
            text = [text]
        # stable per-process-and-run ids (hash() is randomized per process)
        ids = [[(sum(map(ord, w)) % 100) + 1 for w in t.split()][:32] for t in text]
        ids = [i + [0] * (32 - len(i)) for i in ids]
        arr = np.asarray(ids, np.int32)
        out = arr[0] if len(text) == 1 else arr
        return {"input_ids": out, "attention_mask": (out != 0).astype(np.int32)}


# --------------------------------------------------------------------- samplers
def test_sharded_sampler_partitions():
    n, shards = 103, 4
    all_idx = []
    lens = set()
    for s in range(shards):
        smp = ShardedSampler(n, num_shards=shards, shard=s, shuffle=True, seed=3)
        smp.set_epoch(2)
        idx = list(smp)
        lens.add(len(idx))
        all_idx.extend(idx)
    assert lens == {26}  # ceil(103/4), padded
    assert set(all_idx) == set(range(n))  # covers everything


def test_sharded_sampler_deterministic_per_epoch():
    a = ShardedSampler(50, 2, 0, seed=1)
    b = ShardedSampler(50, 2, 0, seed=1)
    a.set_epoch(5), b.set_epoch(5)
    assert list(a) == list(b)
    b.set_epoch(6)
    assert list(a) != list(b)


def test_curriculum_progress_matches_reference_formula():
    # reference main_egoexo4d_distributed.py:48
    smp = CurriculumShardedSampler(
        1000, max_epochs=100, start_frac=0.5, end_epoch_frac=0.75
    )
    for epoch in [0, 10, 50, 74, 75, 99]:
        smp.set_epoch(epoch)
        expect = max(0.5, min(1.0, 0.5 + (epoch / (100 * 0.75)) * 0.75))
        assert smp.curriculum_progress() == pytest.approx(expect)
    smp.set_epoch(0)
    assert max(list(smp)) < 500  # only easy prefix visible early


def test_get_phase():
    # reference :92-103 — 4 phases, final phase = 40% of 100 epochs
    assert get_phase(0, 100, 4, 0.4) == 0
    assert get_phase(59, 100, 4, 0.4) == 2
    assert get_phase(60, 100, 4, 0.4) == 3
    assert get_phase(99, 100, 4, 0.4) == 3


# ---------------------------------------------------------------------- collate
def test_pad_by_last_and_masks():
    v = np.arange(6, dtype=np.float32).reshape(3, 2)
    p = pad_by_last(v, 5)
    assert p.shape == (5, 2)
    assert (p[3] == v[-1]).all() and (p[4] == v[-1]).all()

    out = stack_videos([v, np.ones((5, 2), np.float32)], seq_bucket=5)
    assert out["video"].shape == (2, 5, 2)
    assert out["video_padding_mask"].tolist() == [
        [False, False, False, True, True], [False] * 5
    ]


def test_stack_texts_static_shape():
    toks = [np.ones((2, 32), np.int32), np.ones((5, 32), np.int32)]
    out = stack_texts(toks, [[0, 1], [0, 1, 2, 3, 4]], [[1, 2], [1, 2, 3, 4, 5]], 4)
    assert out["token"].shape == (2, 4, 32)
    assert out["text_padding_mask"][0].tolist() == [False, False, True, True]
    # over-bucket texts truncated
    assert out["start"][1].tolist() == [0, 1, 2, 3]


# --------------------------------------------------------------------- pipeline
def test_threaded_loader_order_and_shapes():
    class DS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32)}

    loader = ThreadedLoader(DS(), batch_size=4, num_workers=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == 5
    assert batches[0]["x"][:, 0].tolist() == [0, 1, 2, 3]
    assert batches[4]["x"][:, 0].tolist() == [16, 17, 18, 19]


def test_background_iterator_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    it = BackgroundIterator(gen())
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


# --------------------------------------------------------------------- HTM data
def _htm_fixture(n_vids=25, vlen=200):
    rng = np.random.RandomState(0)
    mem, asr = {}, {}
    for i in range(n_vids):
        vid = f"vid{i:03d}"
        mem[vid] = rng.randn(vlen, 16).astype(np.float32)
        starts = np.sort(rng.rand(12) * (vlen - 20)).tolist()
        asr[vid] = {
            "text": [f"sentence {j} of {vid}" for j in range(12)],
            "start": starts,
            "end": [s + 3 + rng.rand() * 5 for s in starts],
        }
    return mem, asr


def test_htm_feature_dataset():
    mem, asr = _htm_fixture()
    cfg = HTMConfig(duration=64, text_bucket=8)
    ds = HTMFeatureDataset(
        cfg, DummyTokenizer(), mode="train", asr=asr,
        store=FeatureStore(mem=mem),
    )
    # split: first 5% of 25 = 1 val vid
    val = HTMFeatureDataset(
        cfg, DummyTokenizer(), mode="val", asr=asr, store=FeatureStore(mem=mem)
    )
    assert len(ds) == 24 and len(val) == 1

    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch["video"].shape == (2, 64, 16)
    assert batch["token"].shape == (2, 8, 32)
    assert batch["start"].shape == (2, 8)
    assert not batch["video_padding_mask"][:, 0].any()
    # text spans live inside the window
    valid = ~batch["text_padding_mask"]
    assert (batch["end"][valid] <= 64).all()
    assert (batch["start"][valid] >= 0).all()
    assert (batch["abs_text_pos"] <= 1.0).all()

    # determinism per (seed, epoch, index)
    a, b = ds[3], ds[3]
    assert a["cut_start"] == b["cut_start"]
    ds.set_epoch(1)
    c = ds[3]
    assert a["cut_start"] != c["cut_start"] or a["_texts"]["text"] != c["_texts"]["text"]


def test_htm_align_full_mode():
    mem, _ = _htm_fixture(n_vids=3)
    anno = {
        vid: [[1, 5.0, 9.0, "wash the car"], [0, 20.0, 30.0, "umm so yeah"]]
        for vid in mem
    }
    ds = HTMAlignDataset(HTMConfig(), mode="full", anno=anno,
                         store=FeatureStore(mem=mem))
    item = ds[0]
    assert item["video"].shape == (200, 16)
    assert item["aligned"].tolist() == [1, 0]
    assert item["start"].tolist() == [5.0, 20.0]


def test_htm_align_window_mode():
    mem, _ = _htm_fixture(n_vids=3, vlen=300)
    anno = {
        vid: [[j % 2, 10.0 * j, 10.0 * j + 6, f"step {j}"] for j in range(20)]
        for vid in mem
    }
    ds = HTMAlignDataset(
        HTMConfig(duration=64, text_bucket=8), tokenizer=DummyTokenizer(),
        mode="window", anno=anno, store=FeatureStore(mem=mem),
    )
    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch["video"].shape == (2, 64, 16)
    assert batch["aligned"].shape == (2, 8)


# ------------------------------------------------------------------- EgoExo4D
def _egoexo_fixture(n_takes=2, dur=60, c=24):
    rng = np.random.RandomState(1)
    cams = ["cam01", "cam02", "gp03"]
    mem_v, mem_n = {}, {}
    split_rows, annotations, rankings, takes_cams = [], [], {}, {}
    for k in range(n_takes):
        take, uid = f"take{k}", f"uid{k}"
        split_rows.append({
            "take_name": take, "take_uid": uid,
            "duration_sec": dur, "ego_cam": "aria01",
        })
        takes_cams[take] = [f"{c_}.mp4" for c_ in cams]
        for cam in cams + ["aria01"]:
            mem_v[f"{take}_{cam}"] = rng.randn(dur, c).astype(np.float32)
        rankings[uid] = {
            str(t): {str(r): cams[(t + r) % len(cams)] for r in range(len(cams))}
            for t in range(dur)
        }
        for j in range(6):
            nid = f"narr{k}_{j}"
            s = int(rng.randint(0, dur - 8))
            annotations.append({
                "video_id": take, "unique_narration_id": nid,
                "start_frame": s * 30, "end_frame": (s + 5) * 30,
                "narration": f"does step {j}",
            })
            mem_n[f"{take}/{nid}"] = rng.randn(1, c).astype(np.float32)
    src = EgoExoSource(
        split_rows=split_rows, annotations=annotations,
        camera_rankings=rankings, takes_cams=takes_cams,
        video_store=FeatureStore(mem=mem_v),
        narration_store=FeatureStore(mem=mem_n),
    )
    return src


def test_egoexo4d_grounding_dataset():
    src = _egoexo_fixture()
    cfg = EgoExoConfig(
        duration=20, hop_length=10, views="exo", feature_dim=24,
        use_distill_nce_loss=True, use_center_duration=True,
        same_view_negative=True,
    )
    ds = EgoExo4DDataset(cfg, src, split="train")
    assert len(ds) > 0
    item = ds[0]
    assert item["video_features"].shape == (20, 24)
    assert item["narration_features"].shape == (20, 24)
    assert item["starts"].shape == (20,)
    assert (item["starts"] >= 0).all() and (item["ends"] <= 1).all()
    assert item["mean"].shape == (20,)
    assert item["ego_video_features"].shape == (7, 20, 24)  # padded to 7 views
    assert item["view_rank_label"].shape == (20,)
    assert item["valid_views_mask"].shape == (7, 20)
    # valid view mask marks the positive view at each timestep
    for t in range(20):
        assert item["valid_views_mask"][item["view_rank_label"][t], t]
    assert item["same_view_neg_idxs"].shape == (20,)
    assert (item["same_view_neg_idxs"] >= 0).all()
    assert (item["same_view_neg_idxs"] < 20).all()

    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch["video_features"].shape == (2, 20, 24)
    assert isinstance(batch["metadata"]["video_id"], list)


def test_egoexo4d_multiview_stitching():
    src = _egoexo_fixture()
    cfg = EgoExoConfig(
        duration=20, hop_length=10, views="multi", num_max_views=6,
        feature_dim=24, model="grounding",
    )
    ds = EgoExo4DDataset(cfg, src, split="train")
    item = ds[0]
    assert item["video_features"].shape == (120, 24)  # 6 views x 20 s
    # every available view has real (non-ones) features and False padding
    avail = item["view_available_mask"]
    assert avail.any()
    assert (~item["video_padding_mask"] == avail).all()
    # all 3 cams stitched in (intended behavior; reference bug fixed)
    assert avail.reshape(6, 20).any(axis=1).sum() == 3


def test_egoexo4d_tan_variant():
    src = _egoexo_fixture()
    cfg = EgoExoConfig(duration=20, hop_length=10, views="exo", feature_dim=24)
    ds = EgoExo4DTANDataset(cfg, src, split="train")
    item = ds[0]
    assert item["video"].shape == (20, 24)
    assert isinstance(item["start"], list)
    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch["video"].shape == (2, 20, 24)
    assert isinstance(batch["start"], list) and len(batch["start"]) == 2


def test_egoexo4d_curriculum_windows_sorted():
    src = _egoexo_fixture()
    cfg = EgoExoConfig(
        duration=20, hop_length=20, views="all", feature_dim=24,
        curriculum_train=True, sorted_curr_train="sorted",
    )
    ds = EgoExo4DDataset(cfg, src, split="train")
    dists = [w["cam_ego_distance"] for w in ds.windows]
    assert dists == sorted(dists)


def test_camera_view_order_fallback():
    cams, dist = camera_view_order(None, ["cam01", "cam02", "aria01"],
                                   0, 20, "aria01")
    assert dist["aria01"] == 0  # ego first in distance order
    assert cams[-1] == "aria01"  # reversed list ends with ego


# ----------------------------------------------------------------------- LEMMA
def test_lemma_dataset():
    rng = np.random.RandomState(2)
    dur = 80
    mem_v = {
        f"lv_{cam}": rng.randn(dur, 24).astype(np.float32)
        for cam in ("fpv1", "master")
    }
    mem_n = {str(i): rng.randn(1, 32).astype(np.float32) for i in range(4)}
    annotations = [
        {
            "vid_name": "lv", "unique_narration_id": f"n{i}",
            "start_frame": i * 24 * 10, "end_frame": (i * 10 + 6) * 24,
            "narration": f"HOI {i}",
        }
        for i in range(4)
    ]
    ds = LemmaDataset(
        LemmaConfig(duration=64, hop_length=8, feature_dim=32,
                    use_distill_nce_loss=True),
        split_rows=[{"video_id": "lv", "duration_sec": dur}],
        annotations=annotations,
        hoi_text_map={i: f"text {i}" for i in range(4)},
        video_store=FeatureStore(mem=mem_v),
        narration_store=FeatureStore(mem=mem_n),
        split="train",
    )
    assert len(ds) > 0
    item = ds[0]
    assert item["video_features"].shape == (64, 24)
    assert item["ego_video_features"].shape == (2, 64, 24)
    assert (item["view_rank_label"] == 0).all()
    assert (item["view_rank_neg_label"] == 1).all()
    assert item["metadata"]["per_second_views"] == ["1"] * 64


# -------------------------------------------------------------------- YouCook2
def test_youcook2_dataset_modes():
    rng = np.random.RandomState(3)
    mem = {"ycvid": rng.randn(300, 16).astype(np.float32)}
    anno = {
        "ycvid": {
            "annotations": [
                {"segment": [40.0, 90.0], "sentence": "mix the batter"},
                {"segment": [120.0, 140.0], "sentence": "fry the egg"},
            ]
        }
    }
    ds = YouCook2Dataset(
        YouCook2Config(num_clips=4, seq_len=-1), FeatureStore(mem=mem),
        anno, mode="val", half_val=False,
    )
    assert len(ds) == 2
    item = ds[0]
    # duration 50 -> chosen_vlen = 100 covering windows
    assert item["video"].shape == (4, 100, 16)
    assert (item["end_idx"] - item["start_idx"] == 50).all()

    ds2 = YouCook2Dataset(
        YouCook2Config(num_clips=3, seq_len=32), FeatureStore(mem=mem),
        anno, mode="val", half_val=False,
    )
    assert ds2[0]["video"].shape == (3, 32, 16)


# ------------------------------------------------------------------- native IO
def test_feature_store_read_windows_backends(tmp_path):
    rng = np.random.RandomState(5)
    arrs = {f"w{i}": rng.randn(100, 32).astype(np.float32) for i in range(4)}
    # npy-backed (native fast path when built)
    for vid, a in arrs.items():
        np.save(str(tmp_path / f"{vid}.npy"), a)
    store_npy = FeatureStore(str(tmp_path), (".npy",))
    store_mem = FeatureStore(mem=arrs)
    vids = list(arrs)
    starts, ends = [5, 90, 0, 50], [69, 154, 64, 114]  # second runs off the end
    v1, m1 = store_npy.read_windows(vids, starts, ends, 64, 32)
    v2, m2 = store_mem.read_windows(vids, starts, ends, 64, 32)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    np.testing.assert_array_equal(m1, m2)
    assert m1[1, 10:].all() and not m1[1, :10].any()  # 90..100 valid
    assert (v1[1, 10:] == arrs["w1"][99]).all()  # pad-by-last


def test_htm_deferred_video_io_parity(tmp_path):
    """defer_video_io=True (native batched gather) == eager per-item reads."""
    rng = np.random.RandomState(0)
    asr = {}
    for i in range(6):
        vid = f"d{i}"
        arr = rng.randn(150, 16).astype(np.float32)
        np.save(str(tmp_path / f"{vid}.mp4.npy"), arr)
        starts = np.sort(rng.rand(8) * 120).tolist()
        asr[vid] = {"text": [f"step {j}" for j in range(8)], "start": starts,
                    "end": [s + 4 for s in starts]}
    cfg = HTMConfig(duration=32, text_bucket=8,
                    video_feature_root=str(tmp_path))
    eager = HTMFeatureDataset(cfg, DummyTokenizer(), mode="train", asr=asr)
    lazy = HTMFeatureDataset(cfg, DummyTokenizer(), mode="train", asr=asr,
                             defer_video_io=True)
    be = eager.collate_fn([eager[i] for i in range(4)])
    bl = lazy.collate_fn([lazy[i] for i in range(4)])
    np.testing.assert_allclose(bl["video"], be["video"], atol=1e-6)
    np.testing.assert_array_equal(bl["video_padding_mask"],
                                  be["video_padding_mask"])
    np.testing.assert_array_equal(bl["token"], be["token"])


# ------------------------------------------------- data-layer edge-case fixes
def test_egoexo4d_pathological_rankings():
    """Empty per-second rankings fall back to the ego view; a single-entry
    ranking where the current cam is its own worst rank uses ego as the
    negative instead of KeyError('-1')."""
    src = _egoexo_fixture()
    uid = "uid0"
    # second 0: empty ranking; second 1: single entry that IS the current cam
    src.camera_rankings[uid]["0"] = {}
    src.camera_rankings[uid]["1"] = {"0": "cam01"}
    cfg = EgoExoConfig(
        duration=20, hop_length=10, views="exo", feature_dim=24,
        use_distill_nce_loss=True,
    )
    ds = EgoExo4DDataset(cfg, src, split="train")
    # find a window of take0 starting at 0 with exo cam01 (curr == '0')
    idx = next(
        i for i, w in enumerate(ds.windows)
        if w["video_id"] == "take0" and int(w["start_sec"]) == 0
        and w["exo_cam"] == "cam01"
    )
    item = ds[idx]
    # empty-rank second labels the ego view (index 0), no crash / stale reuse
    assert item["view_rank_label"][0] == 0
    assert item["view_rank_neg_label"][0] == 0
    # single-entry self ranking: negative falls back to ego (index 0)
    assert item["view_rank_neg_label"][1] == 0


def test_egoexo4d_same_view_neg_boundary_narration():
    """A lone narration starting exactly at the window end must not crash
    randint(low>=high); it falls back to a uniform draw."""
    src = _egoexo_fixture()
    cfg = EgoExoConfig(duration=20, hop_length=10, views="exo",
                       feature_dim=24, same_view_negative=True)
    ds = EgoExo4DDataset(cfg, src, split="train")
    rng = np.random.RandomState(0)
    ego = rng.randn(20, 24).astype(np.float32)
    narr = [rng.randn(1, 24).astype(np.float32)]
    out = ds._same_view_neg_idxs(ego, narr, [20.0], [22.0], rng)
    assert out.shape == (20,)
    assert (0 <= out).all() and (out < 20).all()


def test_camera_view_order_missing_midpoint_pose():
    """Aria pose missing the window-midpoint frame -> ego-first fallback
    instead of ValueError."""
    pose = {
        "aria01": {"camera_extrinsics": {"999": np.eye(3, 4).tolist()}},
        "cam01": {"camera_extrinsics": np.eye(3, 4).tolist()},
    }
    cams, dist = camera_view_order(pose, ["cam01", "aria01"], 0, 20, "aria01")
    assert dist["aria01"] == 0 and cams[-1] == "aria01"


def test_pad_by_last_empty_window():
    from exoground_tpu.data.collate import pad_by_last, stack_videos

    out = pad_by_last(np.zeros((0, 8), np.float32), 4)
    assert out.shape == (4, 8) and (out == 0).all()
    vb = stack_videos([np.zeros((0, 8), np.float32),
                       np.ones((2, 8), np.float32)], 4)
    assert vb["video_padding_mask"][0].all()
    assert not vb["video_padding_mask"][1, :2].any()


def test_read_windows_empty_window_parity(tmp_path):
    """A window entirely past a (truncated) file's end is a zero row with a
    full-PAD mask on BOTH the native and python paths — not an IOError."""
    arr = np.random.RandomState(0).randn(50, 16).astype(np.float32)
    np.save(str(tmp_path / "v.npy"), arr)
    store = FeatureStore(str(tmp_path), (".npy",))
    v, m = store.read_windows(["v", "v"], [60, 0], [92, 32], 32, 16)
    assert m[0].all() and (v[0] == 0).all()
    np.testing.assert_allclose(v[1], arr[:32], atol=1e-6)

    from exoground_tpu.utils import native as native_mod
    paths = [str(tmp_path / "v.npy")]
    v2, m2 = native_mod.gather_windows(
        paths, np.asarray([60]), np.asarray([92]), 32, 16
    )
    assert m2[0].all() and (v2[0] == 0).all()


def test_htm_align_window_mode_unk_fallback():
    """Sub-second segments clip to nothing; window mode emits the [UNK]
    fallback like the train loader instead of crashing the collate."""
    mem, _ = _htm_fixture(n_vids=1, vlen=300)
    vid = list(mem)[0]
    anno = {vid: [[1, 10.2, 10.5, "blip"]]}
    ds = HTMAlignDataset(
        HTMConfig(duration=64, text_bucket=8), tokenizer=DummyTokenizer(),
        mode="window", anno=anno, store=FeatureStore(mem=mem),
    )
    batch = ds.collate_fn([ds[0]])
    assert batch["video"].shape == (1, 64, 16)
    assert batch["token"].shape[0] == 1


def test_lemma_same_view_neg_key_consistent():
    """LEMMA always emits same_view_neg_idxs under same_view_negative, even
    for narration-less windows, so mixed batches collate."""
    from exoground_tpu.data.lemma import LemmaConfig, LemmaDataset

    rng = np.random.RandomState(2)
    dur, c = 48, 24
    mem_v = {f"lv_{cam}": rng.randn(dur, c).astype(np.float32)
             for cam in ("fpv1", "master")}
    mem_n = {"0": rng.randn(1, 32).astype(np.float32)}  # only HOI 0 exists
    annotations = [
        {"vid_name": "lv", "unique_narration_id": "n0",
         "start_frame": 0, "end_frame": 6 * 24, "narration": "HOI 0"},
        {"vid_name": "lv", "unique_narration_id": "n1",
         "start_frame": 18 * 24, "end_frame": 24 * 24, "narration": "HOI 1"},
    ]
    ds = LemmaDataset(
        LemmaConfig(duration=16, hop_length=16, feature_dim=32,
                    same_view_negative=True),
        split_rows=[{"video_id": "lv", "duration_sec": dur}],
        annotations=annotations,
        hoi_text_map={0: "text 0", 1: "text 1"},
        video_store=FeatureStore(mem=mem_v),
        narration_store=FeatureStore(mem=mem_n),
        split="train",
    )
    assert len(ds) == 2
    items = [ds[i] for i in range(len(ds))]
    # second window's only narration (HOI 1) is missing from the store ->
    # narration-less item must still carry the key (zeros fallback)
    assert all("same_view_neg_idxs" in it for it in items)
    batch = ds.collate_fn(items)
    assert batch["same_view_neg_idxs"].shape[0] == len(items)


def test_curriculum_fixed_ramp_uses_end_epoch_frac():
    """--fixed_curriculum: linear start_frac->1.0 at end_epoch_frac*epochs
    (the reference formula cancels end_epoch_frac; default stays parity)."""
    kw = dict(dataset_len=100, max_epochs=100, start_frac=0.5,
              end_epoch_frac=0.75)
    ref = CurriculumShardedSampler(**kw)
    fix = CurriculumShardedSampler(fixed_ramp=True, **kw)
    ref.set_epoch(30), fix.set_epoch(30)
    # reference-parity: 0.5 + 30/100 = 0.8 regardless of end_epoch_frac
    assert abs(ref.curriculum_progress() - 0.8) < 1e-9
    # fixed: 0.5 + (30/75)*0.5 = 0.7; reaches 1.0 at epoch 75
    assert abs(fix.curriculum_progress() - 0.7) < 1e-9
    fix.set_epoch(75)
    assert fix.curriculum_progress() == 1.0


def test_egoexo4d_missing_ranking_second():
    """A second absent from camera_rankings entirely (coverage gap, same
    class as pose gaps) falls back to the ego-view target instead of
    KeyError'ing inside the worker."""
    src = _egoexo_fixture()
    del src.camera_rankings["uid0"]["3"]
    cfg = EgoExoConfig(
        duration=20, hop_length=10, views="exo", feature_dim=24,
        use_distill_nce_loss=True,
    )
    ds = EgoExo4DDataset(cfg, src, split="train")
    idx = next(
        i for i, w in enumerate(ds.windows)
        if w["video_id"] == "take0" and int(w["start_sec"]) == 0
    )
    item = ds[idx]
    assert item["view_rank_label"][3] == 0
    assert item["view_rank_neg_label"][3] == 0


def test_egoexo4d_excess_views_truncated():
    """Takes with more than MAX_DISTILL_VIEWS cameras truncate to the first 7
    views (the reference pads up but never truncates, so its collate would
    crash on ragged shapes); rank labels are clamped into the kept view axis
    so mixed batches still collate."""
    src = _egoexo_fixture()
    rng = np.random.RandomState(7)
    extra = [f"cam{k:02d}" for k in range(10, 18)]  # 8 extra cams -> 11 views
    src.takes_cams["take0"] = src.takes_cams["take0"] + [
        f"{c}.mp4" for c in extra
    ]
    for cam in extra:
        src.video_store.mem[f"take0_{cam}"] = (
            rng.randn(60, 24).astype(np.float32)
        )
    cfg = EgoExoConfig(
        duration=20, hop_length=10, views="exo", feature_dim=24,
        use_distill_nce_loss=True,
    )
    ds = EgoExo4DDataset(cfg, src, split="train")
    idx = next(
        i for i, w in enumerate(ds.windows) if w["video_id"] == "take0"
    )
    item = ds[idx]
    assert item["ego_video_features"].shape == (7, 20, 24)
    assert item["valid_views_mask"].shape == (7, 20)
    assert (item["view_rank_label"] < 7).all()
    assert (item["view_rank_neg_label"] < 7).all()
    other = next(
        i for i, w in enumerate(ds.windows) if w["video_id"] == "take1"
    )
    batch = ds.collate_fn([ds[idx], ds[other]])
    assert batch["ego_video_features"].shape == (2, 7, 20, 24)


class _CountingStore(FeatureStore):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.reads = []

    def read(self, vid, start=None, end=None):
        self.reads.append((vid, start, end))
        return super().read(vid, start, end)


def test_egoexo4d_rankings_only_skips_feature_reads():
    """model='joint' without use_distill_nce_loss only needs per-second view
    RANKINGS (string metadata); the per-view feature windows must not be
    read (the reference reads all ~7 views unconditionally and discards
    them). The rankings-derived outputs must match the reading path."""
    src = _egoexo_fixture()
    counting = _CountingStore(mem=src.video_store.mem)
    src.video_store = counting
    cfg = EgoExoConfig(
        duration=20, hop_length=10, views="exo", feature_dim=24,
        model="joint", use_distill_nce_loss=False,
    )
    ds = EgoExo4DDataset(cfg, src, split="train")
    counting.reads.clear()
    item = ds[0]
    # exactly one read: the exo input track itself
    assert len(counting.reads) == 1, counting.reads
    assert "ego_video_features" not in item
    views_fast = item["metadata"]["per_second_views"]

    cfg2 = EgoExoConfig(
        duration=20, hop_length=10, views="exo", feature_dim=24,
        model="joint", use_distill_nce_loss=True,
    )
    ds2 = EgoExo4DDataset(cfg2, src, split="train")
    item2 = ds2[0]
    assert views_fast == item2["metadata"]["per_second_views"]
    assert item["metadata"]["narr_ranks"] == item2["metadata"]["narr_ranks"]


def test_lemma_skips_ego_read_without_distill():
    """LEMMA's ego-track read only feeds the distill tensors; without
    use_distill_nce_loss it must not touch the ego view."""
    from exoground_tpu.data.lemma import LemmaConfig, LemmaDataset

    rng = np.random.RandomState(3)
    mem_v = {f"lv_{cam}": rng.randn(32, 24).astype(np.float32)
             for cam in ("fpv1", "master")}
    store = _CountingStore(mem=mem_v)
    ds = LemmaDataset(
        LemmaConfig(duration=16, hop_length=16, feature_dim=24),
        split_rows=[{"video_id": "lv", "duration_sec": 32}],
        annotations=[{"vid_name": "lv", "unique_narration_id": "n0",
                      "start_frame": 0, "end_frame": 6 * 24,
                      "narration": "HOI 0"}],
        hoi_text_map={0: "text 0"},
        video_store=store,
        narration_store=FeatureStore(
            mem={"0": rng.randn(1, 24).astype(np.float32)}
        ),
        split="train",
    )
    store.reads.clear()
    item = ds[0]
    assert len(store.reads) == 1 and not store.reads[0][0].endswith("fpv1")
    assert "ego_video_features" not in item


def test_htm_defer_collate_caches_dim():
    """Deferred-IO collate probes the feature dim once per dataset, not once
    per batch."""
    mem, asr = _htm_fixture(n_vids=3)
    store = _CountingStore(mem=mem)
    ds = HTMFeatureDataset(
        HTMConfig(duration=32, text_bucket=4), DummyTokenizer(),
        mode="train", asr=asr, store=store, defer_video_io=True,
    )
    items = [ds[0], ds[1]]
    store.reads.clear()
    ds.collate_fn(items)
    probes = [r for r in store.reads if r[1:] == (0, 1)]
    assert len(probes) == 1
    ds.collate_fn(items)
    probes = [r for r in store.reads if r[1:] == (0, 1)]
    assert len(probes) == 1, "dim probe must be cached across batches"


def test_native_truncated_npy_rejected(tmp_path):
    """A file truncated mid-write keeps a valid header claiming the full
    shape; both the native parser (bounds check vs the mapped bytes) and the
    numpy fallback must treat it as unreadable instead of reading past the
    mapping (SIGBUS) or returning garbage."""
    from exoground_tpu.utils import native as native_mod

    p = str(tmp_path / "trunc.npy")
    np.save(p, np.random.RandomState(0).randn(100, 16).astype(np.float32))
    import os as _os
    with open(p, "r+b") as f:
        f.truncate(_os.path.getsize(p) - 2000)

    assert native_mod.npy_shape(p) is None
    v, m = native_mod.gather_windows(
        [p], np.asarray([0]), np.asarray([50]), 50, 16, on_error="pad"
    )
    assert m[0].all() and (v[0] == 0).all()
    with pytest.raises((IOError, ValueError)):
        native_mod.gather_windows([p], np.asarray([0]), np.asarray([50]), 50, 16)


def test_native_scalar_and_1d_npy_contract(tmp_path):
    """0-d files probe to None on both paths; 1-D files read as (T, 1) on
    both the native parser and the numpy fallback."""
    from exoground_tpu.utils import native as native_mod

    p0 = str(tmp_path / "scalar.npy")
    np.save(p0, np.float32(3.0))
    assert native_mod.npy_shape(p0) is None

    p1 = str(tmp_path / "one_d.npy")
    np.save(p1, np.arange(7, dtype=np.float32))
    assert native_mod.npy_shape(p1) == (7, 1)
    v, m = native_mod.gather_windows(
        [p1], np.asarray([0]), np.asarray([7]), 8, 1
    )
    assert v[0, :7, 0].tolist() == list(range(7))
    assert m[0, 7] and not m[0, :7].any()

    # force the numpy fallback (monkeypatch get_lib) and re-check parity
    real = native_mod.get_lib
    try:
        native_mod.get_lib = lambda: None
        assert native_mod.npy_shape(p0) is None
        assert native_mod.npy_shape(p1) == (7, 1)
        v2, m2 = native_mod.gather_windows(
            [p1], np.asarray([0]), np.asarray([7]), 8, 1
        )
        np.testing.assert_array_equal(v, v2)
        np.testing.assert_array_equal(m, m2)
    finally:
        native_mod.get_lib = real


def test_native_empty_2d_npy_accepted(tmp_path):
    """A legitimate (0, C) file has zero payload bytes; the truncation
    bounds check must not reject it (parity with the numpy fallback)."""
    from exoground_tpu.utils import native as native_mod

    p = str(tmp_path / "empty.npy")
    np.save(p, np.zeros((0, 16), np.float32))
    assert native_mod.npy_shape(p) == (0, 16)
    v, m = native_mod.gather_windows(
        [p], np.asarray([0]), np.asarray([4]), 4, 16
    )
    assert m[0].all() and (v[0] == 0).all()

def test_native_empty_cols_npy_accepted(tmp_path):
    """A legitimate (R, 0) file also has zero payload bytes; the native
    parser must match the numpy fallback instead of treating it as corrupt."""
    from exoground_tpu.utils import native as native_mod

    p = str(tmp_path / "emptycols.npy")
    np.save(p, np.zeros((5, 0), np.float32))
    assert native_mod.npy_shape(p) == (5, 0)


def test_threaded_loader_forwards_epoch_to_dataset():
    """set_epoch must reach the dataset (per-epoch augmentation RNG — e.g.
    HTMClipDataset clip jitter), not just the sampler: S3DTrainer.fit only
    sees the loader."""
    class DS:
        def __init__(self):
            self.epoch = 0

        def set_epoch(self, epoch):
            self.epoch = epoch

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"x": np.full((2,), self.epoch, np.float32)}

    ds = DS()
    loader = ThreadedLoader(ds, batch_size=4, num_workers=2, shuffle=False)
    loader.set_epoch(3)
    assert ds.epoch == 3
    batch = next(iter(loader))
    assert batch["x"][0, 0] == 3.0

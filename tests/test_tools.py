"""Offline preprocessing (sentencify) tests against reference semantics."""

import os

import numpy as np
import pytest

from exoground_tpu.tools import (
    Sentencify,
    filter_language,
    filter_length,
    merge_linebreaks,
    process_corpus,
)


def test_filter_length():
    # reference filters/utils.py:36-41: >10 captions AND mean words > 5
    good = ["one two three four five six seven"] * 12
    assert filter_length(good)
    assert not filter_length(good[:5])  # too few
    assert not filter_length(["hi there"] * 20)  # too short


def test_filter_language():
    en = ["so now we are going to mix the batter for the cake"] * 8
    assert filter_language(en)
    nonsense = ["zzz qqq xxx www yyy kkk"] * 8
    assert not filter_language(nonsense)


def test_merge_linebreaks_glitch_and_tags():
    caps = ["blip", "[MUSIC]", "hello world this is fine"]
    starts = [0.0, 1.0, 2.0]
    ends = [0.1, 1.9, 4.0]  # first is a <0.2 s glitch
    c, s, e = merge_linebreaks(caps, starts, ends)
    assert c == ["hello world this is fine"]
    assert s == [2.0] and e == [4.0]


def test_merge_linebreaks_rolling_caption_dedup():
    # rolling two-row captions: second row repeats as next caption's first row
    caps = ["first line\nsecond line", "second line\nthird line", "third line done"]
    starts = [0.0, 2.0, 4.0]
    ends = [2.0, 4.0, 6.0]
    c, s, e = merge_linebreaks(caps, starts, ends)
    # repeated second row dropped; non-repeated linebreak joined with space
    assert c == ["first line", "second line third line", "third line done"]


def test_merge_linebreaks_overlap_averaging():
    caps = ["sentence one is here", "sentence two is here"]
    c, s, e = merge_linebreaks(caps, [0.0, 3.0], [5.0, 8.0])
    # overlap [3, 5] -> midpoint 4.0 on both sides
    assert e[0] == 4.0 and s[1] == 4.0


def test_sentencify_already_punctuated_path():
    sf = Sentencify()
    caps = ["hello world. how are you", "today is great."]
    c, s, e = sf.punctuate_and_cut(caps, [0.0, 4.0], [4.0, 8.0])
    assert c[0] == "hello world."
    assert c[1] == "how are you today is great."
    # timestamps interpolated inside caption spans
    assert s[0] == 0.0 and 1.5 < e[0] <= 2.0
    assert 1.5 < s[1] <= 2.0 and e[1] == 8.0


def test_sentencify_unpunctuated_with_injected_model():
    # tokens: cut after token 'batter' (full stop id 2 = '.O')
    def fake_punct(tokens):
        return [2 if t == "batter" else 1 for t in tokens]

    sf = Sentencify(punctuate_fn=fake_punct)
    caps = ["so we mix the batter then bake the cake"]
    c, s, e = sf.punctuate_and_cut(caps, [0.0], [9.0])
    assert len(c) == 2
    assert c[0].endswith("batter")
    assert c[1].startswith("then")
    assert s[1] > s[0] and e[1] == 9.0


def test_sentencify_gap_cut():
    sf = Sentencify()  # fallback model never emits stops; gap cut only
    caps = ["first chunk here", "second chunk here"]
    c, s, e = sf.punctuate_and_cut(caps, [0.0, 10.0], [3.0, 13.0])
    assert len(c) == 2  # 7-second silence forces a cut


def test_sentencify_wordpiece_merge():
    def no_stops(tokens):
        return [1] * len(tokens)

    def wp_tokenize(s):
        # fake wordpieces: 'mixing' -> ['mix', '##ing']
        out = []
        for w in s.split():
            if w == "mixing":
                out.extend(["mix", "##ing"])
            else:
                out.append(w)
        return out

    sf = Sentencify(punctuate_fn=no_stops, tokenize_fn=wp_tokenize)
    c, _, _ = sf.punctuate_and_cut(["we are mixing stuff"], [0.0], [4.0])
    assert c == ["we are mixing stuff"]


def test_process_corpus_end_to_end():
    asr = {
        "goodvid": {
            "text": ["so now we are going to mix the batter. for the cake"] * 12,
            "start": [float(2 * i) for i in range(12)],
            "end": [float(2 * i + 2) for i in range(12)],
        },
        "shortvid": {"text": ["hi"], "start": [0.0], "end": [1.0]},
    }
    out = process_corpus(asr)
    assert "goodvid" in out and "shortvid" not in out
    entry = out["goodvid"]
    assert len(entry["text"]) == len(entry["start"]) == len(entry["end"])
    assert all(e >= s for s, e in zip(entry["start"], entry["end"]))


def test_visualization_outputs(tmp_path):
    from exoground_tpu.utils.visualize import plot_similarity_grid, save_features_to_dir

    rng = np.random.RandomState(0)
    sim = rng.rand(64, 5).astype(np.float32)
    p = plot_similarity_grid(
        sim, [5, 10, 20, 30, 50], [9, 15, 28, 40, 60],
        str(tmp_path / "grid.png"), title="test",
        pred_starts=[4, 11, 19, 31, 49], pred_ends=[8, 16, 29, 41, 61],
    )
    import os
    assert os.path.exists(p) and os.path.getsize(p) > 1000

    written = save_features_to_dir(
        str(tmp_path / "feats"),
        {"video_id": ["t0", "t1"], "exo_camera": ["cam01", "cam02"],
         "start_sec": [0, 10]},
        rng.rand(2, 16, 8).astype(np.float32),
        target_features=rng.rand(2, 3, 16, 8).astype(np.float32),
        positive_idxs=rng.randint(0, 3, (2, 16)),
    )
    assert len(written) == 2
    out = np.load(os.path.join(written[0], "output_features.npy"))
    assert out.shape == (16, 8)
    assert os.path.exists(os.path.join(written[1], "ego_seq.npy"))


def test_annotate_frame_and_dual_video(tmp_path):
    import cv2
    from exoground_tpu.utils.visualize import visualize_dual_video

    # synthesize a tiny source video
    src = str(tmp_path / "src.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (64, 48))
    for i in range(40):
        w.write(np.full((48, 64, 3), i * 5 % 255, np.uint8))
    w.release()

    out = visualize_dual_video(
        src, str(tmp_path / "dual.mp4"),
        narrs=["does the thing"],
        pred_starts=[0.1], pred_ends=[0.5],
        gt_starts=[0.2], gt_ends=[0.6],
        pad_mask=[0], start_sec=0, seq_len=4,
    )
    assert out and np.round(cv2.VideoCapture(out).get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    # missing source -> graceful None
    assert visualize_dual_video(
        str(tmp_path / "nope.mp4"), str(tmp_path / "x.mp4"), [], [], [], [], [],
        [], 0, 4,
    ) is None


def test_extract_features_harness():
    import jax.numpy as jnp

    from exoground_tpu.tools import (
        ExtractConfig,
        bf16_params_keep_layernorm,
        extract_video_features,
    )

    rng = np.random.RandomState(0)
    params = {
        "proj": {"kernel": rng.randn(12, 8).astype(np.float32)},
        "ln_final": {"scale": np.ones(8, np.float32), "bias": np.zeros(8, np.float32)},
    }
    cast = bf16_params_keep_layernorm(params)
    assert cast["proj"]["kernel"].dtype == jnp.bfloat16
    assert cast["ln_final"]["bias"].dtype == jnp.float32

    def encode(p, frames):
        pooled = frames.mean(axis=(1, 2))  # (B, 3)
        feat = jnp.concatenate([pooled, pooled, pooled, pooled], -1)  # (B, 12)
        return (feat @ p["proj"]["kernel"].astype(feat.dtype)).astype(jnp.float32)

    frames = rng.rand(37, 8, 8, 3).astype(np.float32)
    cfg = ExtractConfig(fps=1, frame_bucket=16, half=True)
    feats = extract_video_features(encode, params, frames, cfg)
    assert feats.shape == (37, 8) and feats.dtype == np.float16

    # fps=8 pooling: 37 frames -> 4 seconds
    feats8 = extract_video_features(encode, params, frames, ExtractConfig(fps=8, frame_bucket=16))
    assert feats8.shape == (4, 8)


def test_asr_wrappers_with_injected_models():
    from exoground_tpu.tools import WhisperASR, detect_language, save_asr_json, transcribe_or_translate

    def fake_pipe(path):
        return {"chunks": [
            {"text": " hello there ", "timestamp": (0.0, 2.5)},
            {"text": "bonjour", "timestamp": (3.0, 4.0)},
        ]}

    asr = WhisperASR(pipeline_fn=fake_pipe)
    segs = asr.transcribe("x.wav")
    assert segs[0] == {"text": "hello there", "start": 0.0, "end": 2.5}

    assert detect_language("x.wav", text_probe=["so we are going to do the thing now"]) == "en"

    out = transcribe_or_translate(
        "x.wav", language="fr", asr=asr,
        translate_fn=lambda ts: [t.upper() for t in ts],
    )
    assert out[1]["text"] == "BONJOUR"

    import pytest
    with pytest.raises(RuntimeError):
        WhisperASR()


def test_save_asr_json(tmp_path):
    from exoground_tpu.tools import save_asr_json

    p = save_asr_json(
        {"v1": [{"text": "a", "start": 0.0, "end": 1.0}]},
        str(tmp_path / "asr.json"),
    )
    import json
    blob = json.load(open(p))
    assert blob["v1"]["text"] == ["a"]


@pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
def test_visualize_features_end_to_end(tmp_path):
    """VERDICT r1 #10: scripted notebook replacement — dump -> heatmap +
    projection PNGs on synthetic features."""
    from exoground_tpu.tools.visualize_features import (
        cosine_similarity_heatmap,
        load_feature_dumps,
        project_2d,
        visualize_dump_dir,
    )
    from exoground_tpu.utils.visualize import save_features_to_dir

    rng = np.random.RandomState(0)
    b, v, t, c = 3, 2, 10, 8
    meta = {
        "video_id": [f"take{i}" for i in range(b)],
        "exo_camera": ["cam01"] * b,
        "start_sec": [i * 16 for i in range(b)],
    }
    out = rng.randn(b, t, c).astype(np.float32)
    tgt = rng.randn(b, v, t, c).astype(np.float32)
    pos = rng.randint(0, v, (b, t))
    dump = str(tmp_path / "dumps")
    save_features_to_dir(dump, meta, out, tgt, pos)

    recs = load_feature_dumps(dump)
    assert len(recs) == b and recs[0]["output_features"].shape == (t, c)

    hm = cosine_similarity_heatmap(out[0], tgt[0], pos[0])
    assert hm.shape == (t, t)
    np.testing.assert_allclose(np.diag(hm), [
        float(np.dot(out[0, i], tgt[0, pos[0, i], i])
              / (np.linalg.norm(out[0, i]) * np.linalg.norm(tgt[0, pos[0, i], i])))
        for i in range(t)
    ], atol=1e-6)

    embs = project_2d([out[0], tgt[0].reshape(-1, c)], method="pca")
    assert embs[0].shape == (t, 2) and embs[1].shape == (v * t, 2)
    # t-SNE path (sklearn) on a small set
    embs_t = project_2d([out[0], tgt[0].reshape(-1, c)], method="tsne")
    assert embs_t[0].shape == (t, 2)

    out_dir = str(tmp_path / "pngs")
    written = visualize_dump_dir(dump, out_dir, method="pca")
    assert len(written) == 2 * b  # heatmap + projection per window
    assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in written)


def test_stratify_results_end_to_end(tmp_path):
    """Scripted scenario-stratification (reference
    visualization/scenario_stratification_results.ipynb): trainer-format
    results -> per-task tables, recall@theta, seen/unseen split, plot."""
    import json

    from exoground_tpu.tools.stratify_results import (
        flatten_results,
        recall_at_thresholds,
        run,
    )

    rng = np.random.RandomState(0)
    takes = [
        {"take_name": "uni_bike_01", "task_name": "bike repair",
         "parent_task_name": "repair"},
        {"take_name": "uni_cook_01", "task_name": "cooking pasta",
         "parent_task_name": "cooking"},
        {"take_name": "uni_cook_02", "task_name": "cooking pasta",
         "parent_task_name": "cooking"},
    ]
    takes_path = tmp_path / "takes.json"
    takes_path.write_text(json.dumps(takes))
    (tmp_path / "unseen.txt").write_text("uni_cook_02\n")

    def result_batch(take, n, base):
        # (B=2, N) iou map padded to 4; only n real narrations per row
        ious = np.clip(base + 0.1 * rng.rand(2, 4), 0, 1)
        return {
            "loss_dict": ious.tolist(),
            "metadata": {
                "narration": [[f"s{j}" for j in range(n)]] * 2,
                "video_id": [take] * 2,
                "cam_id": ["cam01", "cam02"],
                "narr_ranks": None,
            },
        }

    results = [
        result_batch("uni_bike_01", 3, 0.8),
        result_batch("uni_cook_01", 2, 0.2),
        result_batch("uni_cook_02", 4, 0.5),
    ]
    res_path = tmp_path / "test_results_epoch_1.json"
    res_path.write_text(json.dumps(results))

    recs = flatten_results(results)
    assert len(recs) == 2 * (3 + 2 + 4)  # padding dropped per narration list
    r = recall_at_thresholds([0.05, 0.35, 0.75], thresholds=(0.1, 0.3, 0.7))
    assert r == {"IoU>=0.1": 2 / 3, "IoU>=0.3": 2 / 3, "IoU>=0.7": 1 / 3}

    out_dir = tmp_path / "out"
    report = run(
        [str(res_path)], takes_json=str(takes_path),
        unseen_file=str(tmp_path / "unseen.txt"), group="task",
        out_dir=str(out_dir), plot=True,
    )
    entry = report["models"][str(res_path)]
    groups = {row["group"]: row for row in entry["by_group"]}
    assert set(groups) == {"bike repair", "cooking pasta"}
    assert groups["bike repair"]["mean_iou"] > groups["cooking pasta"]["mean_iou"]
    assert groups["bike repair"]["count"] == 6
    su = entry["seen_unseen"]
    assert su["unseen"]["count"] == 8 and su["seen"]["count"] == 10
    assert os.path.exists(out_dir / "stratified_report.json")
    assert os.path.exists(out_dir / "test_results_epoch_1_task.csv")
    assert os.path.getsize(out_dir / "stratified_task.png") > 0


def test_visualize_features_compare_runs(tmp_path):
    """Multi-run comparison mode (reference parallel_vis_feat.ipynb): two
    dump dirs -> one jointly-embedded scatter, one color per run."""
    from exoground_tpu.tools.visualize_features import compare_runs, main
    from exoground_tpu.utils.visualize import save_features_to_dir

    rng = np.random.RandomState(3)
    b, t, c = 2, 6, 12
    dirs = []
    for k in range(2):
        meta = {
            "video_id": [f"vid{k}"] * b,
            "exo_camera": ["cam01"] * b,
            "start_sec": [i * 16 for i in range(b)],
        }
        d = str(tmp_path / f"run{k}")
        save_features_to_dir(d, meta, rng.randn(b, t, c).astype(np.float32) + k)
        dirs.append(d)

    out = compare_runs(dirs, str(tmp_path / "cmp"), method="pca")
    assert os.path.exists(out) and os.path.getsize(out) > 0
    # CLI route with several dirs picks the comparison mode
    paths = main([
        "--features_dir", *dirs, "--out_dir", str(tmp_path / "cmp2"),
        "--method", "pca", "--labels", "no_distill", "distill",
    ])
    assert len(paths) == 1 and os.path.exists(paths[0])


def test_linear_probe_separable_features():
    """Linear probe (reference end2end/readme.md protocol; no probe code
    ships upstream): separable synthetic classes probe to high top-1."""
    from exoground_tpu.tools.linear_probe import linear_probe, topk_accuracy

    rng = np.random.RandomState(0)
    n_cls, d, per = 5, 16, 40
    centers = rng.randn(n_cls, d) * 4
    def make(n):
        ys = np.repeat(np.arange(n_cls), n)
        xs = centers[ys] + rng.randn(len(ys), d) * 0.5
        return xs.astype(np.float32), ys
    tx, ty = make(per)
    ex, ey = make(10)
    m = linear_probe(tx, ty, ex, ey, max_iter=100)
    assert m["n_classes"] == 5
    assert m["top1"] > 0.9
    assert m["top5"] == 1.0
    # topk helper sanity
    s = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    assert topk_accuracy(s, np.asarray([1, 0]), 1) == 1.0
    assert topk_accuracy(s, np.asarray([2, 1]), 2) == 0.5


def _toy_acoustic(truth_by_span, vocab, n_frames=24, frame_dur=0.1):
    """Synthetic wav2vec2-style CTC model: near-one-hot log-probs placing
    each character at a known frame; blank elsewhere."""
    v = len(vocab) + 1

    def acoustic_fn(audio_path, start, end):
        placements = truth_by_span[(round(start, 3), round(end, 3))]
        em = np.full((n_frames, v), np.log(0.1 / (v - 1)))
        em[:, 0] = np.log(0.9)  # blank
        for ch, frame in placements:
            em[frame, 0] = np.log(0.05)
            em[frame, vocab[ch]] = np.log(0.9)
        return em

    return acoustic_fn


def test_forced_aligner_word_times():
    """CTC trellis forced alignment recovers the planted word timestamps
    (reference transcribe_or_translate.py:102-107 whisperx.align stage)."""
    from exoground_tpu.tools.asr import ForcedAligner

    vocab = {"|": 1}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = i + 2
    placements = [("h", 2), ("e", 4), ("l", 5), ("l", 6), ("o", 7),
                  ("|", 9), ("w", 11), ("o", 12), ("r", 13), ("l", 14),
                  ("d", 16)]
    fn = _toy_acoustic({(2.0, 4.4): placements}, vocab)
    aligner = ForcedAligner(fn, vocab, frame_duration=0.1, blank_id=0)
    words = aligner.align_segment(
        "x.wav", {"text": "Hello  world", "start": 2.0, "end": 4.4}
    )
    assert [w["word"] for w in words] == ["hello", "world"]
    assert abs(words[0]["start"] - 2.2) < 1e-6
    assert abs(words[0]["end"] - 2.8) < 1e-6
    assert abs(words[1]["start"] - 3.1) < 1e-6
    assert abs(words[1]["end"] - 3.7) < 1e-6
    assert all(w["score"] > 0.5 for w in words)
    # unalignable: empty transcript
    assert aligner.align_segment("x.wav", {"text": "", "start": 0, "end": 1}) is None


def test_asr_align_sentencify_chain():
    """ASR -> forced alignment -> sentencify: sentence boundaries land on the
    ALIGNED word times, not uniform interpolation (the reference offline
    pipeline's precision story: whisperx word times feed
    filters/sentencify.py:53-63)."""
    from exoground_tpu.tools.asr import (
        ForcedAligner, WhisperASR, flatten_words, transcribe_or_translate,
    )
    from exoground_tpu.tools.sentencify import Sentencify

    vocab = {"|": 1}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = i + 2
    placements = [("h", 2), ("i", 3), ("|", 5), ("t", 8), ("h", 9), ("e", 10),
                  ("r", 11), ("e", 12), ("|", 14), ("c", 17), ("h", 18),
                  ("e", 19), ("f", 20)]
    fn = _toy_acoustic({(10.0, 12.4): placements}, vocab)
    aligner = ForcedAligner(fn, vocab, frame_duration=0.1, blank_id=0)
    asr = WhisperASR(pipeline_fn=lambda p: {
        "chunks": [{"text": "hi there chef", "timestamp": (10.0, 12.4)}]
    })
    segs = transcribe_or_translate("x.wav", "en", asr=asr, aligner=aligner)
    assert "words" in segs[0] and len(segs[0]["words"]) == 3
    # uniform interpolation would put word 2 at [10.8, 11.6); alignment says
    # "there" spans frames 8..12 -> [10.8, 11.3) -- the END differs
    caps, starts, ends = flatten_words(segs)
    assert caps == ["hi", "there", "chef"]
    assert abs(ends[1] - 11.3) < 1e-6

    # sentencify cuts after "there" (full stop label); sentence times are the
    # aligned word spans
    def punctuate(tokens):
        return [2 if t == "there" else 1 for t in tokens]

    s = Sentencify(punctuate_fn=punctuate, tokenize_fn=lambda x: x.split())
    sents, s_t, e_t = s.punctuate_and_cut(caps, starts, ends)
    assert sents == ["hi there", "chef"]
    assert abs(s_t[0] - 10.2) < 1e-6
    assert abs(e_t[0] - 11.3) < 1e-6
    assert abs(s_t[1] - 11.7) < 1e-6

    # non-EN route: translated text drops word times, native kept
    segs2 = transcribe_or_translate(
        "x.wav", "fr", asr=asr, aligner=aligner,
        translate_fn=lambda texts: [t.upper() for t in texts],
    )
    assert segs2[0]["text"] == "HI THERE CHEF"
    assert "words" not in segs2[0] and "words_native" in segs2[0]
    assert segs2[0]["text_native"] == "hi there chef"


def test_merge_linebreaks_nested_caption_no_inversion():
    """A caption fully nested in its predecessor, with the NEXT caption also
    overlapping it, must not come out with start > end (descending token
    timestamps downstream): spans stay monotone and non-inverted."""
    c, s, e = merge_linebreaks(
        ["span a", "span b", "span c"], [0.0, 10.0, 15.0], [100.0, 20.0, 200.0]
    )
    assert len(c) == 3
    for ss, ee in zip(s, e):
        assert ee >= ss
    for i in range(len(s) - 1):
        assert s[i + 1] >= e[i]


def test_whisper_asr_forwards_translate_task():
    """task='translate' must reach the pipeline's generate kwargs (otherwise
    Whisper silently transcribes in the source language)."""
    from exoground_tpu.tools.asr import WhisperASR

    seen = {}

    def pipe(path, **kw):
        seen.update(kw)
        return {"chunks": [{"timestamp": (0.0, 1.0), "text": "hola"}]}

    asr = WhisperASR(pipeline_fn=pipe, task="translate")
    segs = asr.transcribe("x.wav")
    assert seen.get("generate_kwargs") == {"task": "translate"}
    assert segs[0]["text"] == "hola"

    # default task adds no kwargs (keeps injected simple pipelines working)
    seen.clear()
    asr2 = WhisperASR(pipeline_fn=pipe)
    asr2.transcribe("x.wav")
    assert "generate_kwargs" not in seen


def test_gsam_correlation_end_to_end(tmp_path):
    """gSAM_vis.ipynb counterpart: join + match + trendline + scenario stats
    over a synthetic trainer dump where loss correlates with the SAM score."""
    import json as _json

    from exoground_tpu.tools import gsam_correlation as GS

    rng = np.random.RandomState(0)
    takes = [("uni_cooking_001", "cam01"), ("uni_covid_002", "cam02"),
             ("uni_basketball_003", "gp03")]
    gsam_map, csv_rows, results = {}, [], []
    clip = 0
    for vid, cam in takes:
        real_id = f"{vid}_{cam}"
        narrs, row = [], []
        for j in range(4):
            narr = f"{vid} step {j}"
            sam = float(j) / 3.0
            gsam_map[str(clip)] = sam
            csv_rows.append({"clip_id": str(clip), "narration": narr,
                             "video_id": real_id})
            narrs.append(narr)
            # loss increases with sam + noise -> positive slope
            row.append(0.1 + 0.5 * sam + float(rng.rand()) * 0.01)
            clip += 1
        row.append(0.0)  # padded slot beyond the narration list
        results.append({
            "loss_dict": [row],
            "metadata": {"video_id": [vid], "cam_id": [cam],
                         "narration": [narrs]},
        })

    map_p = str(tmp_path / "map.json")
    with open(map_p, "w") as f:
        _json.dump(gsam_map, f)
    csv_p = str(tmp_path / "keysteps.csv")
    import csv as _csv
    with open(csv_p, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["clip_id", "narration", "video_id"])
        w.writeheader()
        w.writerows(csv_rows)
    res_p = str(tmp_path / "test_results_epoch_1.json")
    with open(res_p, "w") as f:
        _json.dump(results, f)

    out = GS.main([res_p, "--gsam_map", map_p, "--keystep_csv", csv_p,
                   "--out_dir", str(tmp_path / "viz")])
    assert out["n_matched"] == 12
    assert out["slope"] > 0.3  # planted correlation recovered
    # scenario normalization: cooking/covid keep their words, numeric skipped
    assert set(out["scenarios"]) == {"cooking", "covid", "basketball"}
    assert (tmp_path / "viz" / "gsam_scatter.png").exists()
    assert (tmp_path / "viz" / "scenario_bars.png").exists()


def test_whisper_asr_translate_requires_capable_pipeline():
    """An injected pipeline that cannot accept generate_kwargs fails LOUDLY
    under task='translate' instead of silently transcribing."""
    from exoground_tpu.tools.asr import WhisperASR

    import pytest

    def rigid_pipe(path):
        return {"chunks": []}

    asr = WhisperASR(pipeline_fn=rigid_pipe, task="translate")
    with pytest.raises(RuntimeError, match="generate_kwargs"):
        asr.transcribe("x.wav")

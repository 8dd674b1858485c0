"""Eval protocol tests: ROC-AUC, retrieval metrics, overlap-seq stitcher
exactness (batched+padded windows == naive per-window), global mode."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: run with -m slow

from exoground_tpu.evals import AlignEvalConfig, compute_retrieval_metrics, make_tan_sim_fn, roc_auc
from exoground_tpu.evals import test_alignment_htm as run_alignment_htm
from exoground_tpu.models import TemporalAligner


class TestROCAUC:
    def test_simple_cases(self):
        assert roc_auc(np.array([0, 0, 1, 1]), np.array([0.1, 0.2, 0.8, 0.9])) == 1.0
        assert roc_auc(np.array([1, 1, 0, 0]), np.array([0.1, 0.2, 0.8, 0.9])) == 0.0
        np.testing.assert_allclose(
            roc_auc(np.array([0, 1, 0, 1]), np.array([0.5, 0.5, 0.5, 0.5])), 0.5
        )

    def test_matches_quadratic_definition(self):
        rng = np.random.RandomState(0)
        labels = rng.rand(50) > 0.6
        scores = rng.randn(50)
        pos = scores[labels]
        neg = scores[~labels]
        ref = np.mean(
            (pos[:, None] > neg[None, :]).astype(float)
            + 0.5 * (pos[:, None] == neg[None, :])
        )
        np.testing.assert_allclose(roc_auc(labels, scores), ref, rtol=1e-9)


class TestRetrievalMetrics:
    def test_perfect_and_worst(self):
        sim = np.eye(12)
        m = compute_retrieval_metrics(sim)
        assert m["R1"] == 1.0 and m["MR"] == 1.0
        sim = -np.eye(12) + 0.5
        m = compute_retrieval_metrics(sim)
        assert m["R1"] == 0.0

    def test_yc2_protocol_with_real_tower(self):
        """End-to-end test_retrieval_yc2 with the documented feature-fn
        contracts: visual_feature_fn(clips, mask, interp) wired to the real
        TemporalAligner towers (the 3-arg shape the reference closure has,
        eval_zeroshot_retrieval.py:181-185)."""
        from exoground_tpu.evals import test_retrieval_yc2

        d, f = 24, 32
        model = TemporalAligner(
            num_encoder_layers=1, num_joint_layers=1, width=f, heads=4,
            max_pos=16, random_pos_start=0, attn_impl="xla",
        )
        rng = np.random.RandomState(0)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
            jnp.zeros((1, 8, d)), jnp.zeros((1, 2, d)),
            jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
        )

        def visual_fn(clips, mask, interp):
            assert mask.dtype == np.bool_ and mask.shape == clips.shape[:2]
            kw = {} if interp is None else {"interpolate_from": interp}
            return model.apply(
                params, jnp.asarray(clips), jnp.asarray(mask),
                method=type(model).get_visual_feature, **kw,
            )

        def text_fn(lang):
            return model.apply(
                params, jnp.asarray(lang),
                method=type(model).get_textual_feature,
            )

        items = []
        for i in range(6):
            ln = 12 if i < 3 else 16  # second half exercises the interp path
            clips = rng.randn(3, ln, d).astype(np.float32)
            items.append({
                "video": clips,
                "start_idx": np.array([2, 1, 0]),
                "end_idx": np.array([10, 9, 8]),
                "text_embed": rng.randn(d).astype(np.float32),
            })
        m = test_retrieval_yc2(items, visual_fn, text_fn, seq_len=16)
        for k in ("R1", "R5", "R10", "MR", "C-R1", "S-R1"):
            assert k in m and np.isfinite(m[k]), (k, m)
        assert 1.0 <= m["MR"] <= 6.0


def _synthetic_video_item(seed, vlen=180, num_text=14, dim=32):
    rng = np.random.RandomState(seed)
    video = rng.randn(vlen, dim).astype(np.float32)
    aligned = (rng.rand(num_text) > 0.4).astype(np.int64)
    if aligned.sum() == 0:
        aligned[0] = 1
    if (1 - aligned).sum() == 0:
        aligned[1] = 0
    centers = np.sort(rng.rand(num_text)) * (vlen - 10) + 5
    start = np.maximum(centers - rng.randint(2, 8, num_text), 0.0)
    end = np.minimum(centers + rng.randint(2, 8, num_text), vlen)
    text_embed = rng.randn(num_text, dim).astype(np.float32)
    return {
        "video": video,
        "start": start,
        "end": end,
        "aligned": aligned,
        "text_embed": text_embed,
        "vid": f"v{seed}",
    }


def _naive_reference_protocol(items, sim_fn_single, seq_len=64):
    """Direct transcription of the reference overlap-seq loop semantics
    (eval_zeroshot_align.py:127-252) using unbatched single-window calls."""
    recalls, all_scores, all_tgts = [], [], []
    for item in items:
        video, start, end = item["video"], item["start"], item["end"]
        aligned = item["aligned"].astype(bool)
        text_embed = item["text_embed"]
        vlen, num_text = video.shape[0], len(start)
        eps = 1e-5
        steps = np.arange(0, vlen - seq_len // 2, seq_len // 4)
        mid = (start + end) / 2

        logits = np.zeros((num_text, vlen))
        logits_dual = np.zeros((num_text, vlen))
        counter = np.zeros((num_text, vlen))
        a_dual = np.zeros(num_text)
        a_joint = np.zeros(num_text)
        t_counter = np.zeros(num_text)
        for idx, step in enumerate(steps):
            na_idx = np.arange(num_text)[~aligned]
            na_mid = mid[~aligned]
            m = (step - seq_len <= na_mid) & (na_mid <= step + 2 * seq_len)
            act = na_idx[m]
            if len(act) == 0:
                continue
            left, right = act.min(), act.max()
            if idx <= 3:
                left = 0
            elif idx >= len(steps) - 4:
                right = vlen
            amask = np.zeros(num_text, dtype=bool)
            amask[left : right + 1] = True
            hi = min(vlen, step + seq_len)
            out = sim_fn_single(video[step:hi], text_embed[amask])
            sim, dual = out["sim"], out["dual-sim"]  # (K, L)
            a_dual[amask] += dual.max(1)
            a_joint[amask] += sim.max(1)
            t_counter[amask] += 1
            logits[amask, step:hi] += sim
            logits_dual[amask, step:hi] += dual
            counter[amask, step:hi] += 1
        logits /= np.maximum(counter, eps)
        logits_dual /= np.maximum(counter, eps)
        a_dual /= np.maximum(t_counter, eps)
        a_joint /= np.maximum(t_counter, eps)
        sim = (logits + logits_dual) / 2
        sim[sim == 0] = -6e4
        prob = np.exp(sim - sim.max(-1, keepdims=True))
        prob /= prob.sum(-1, keepdims=True)
        all_tgts.append(aligned.astype(int))
        all_scores.append(sim.max(-1))
        for ti in np.arange(num_text)[aligned]:
            s, e = math.floor(start[ti]), math.ceil(end[ti])
            am = prob[ti].argmax()
            recalls.append(s <= am <= e)
    return {
        "Recall": float(np.mean(recalls)),
        "AUC": roc_auc(np.concatenate(all_tgts), np.concatenate(all_scores)),
    }


class TestOverlapSeqStitcher:
    def test_batched_matches_naive_protocol(self):
        """Batched/padded stitcher == direct reference transcription, using a
        padding-invariant linear sim (dot products)."""
        items = [_synthetic_video_item(s) for s in range(3)]

        def sim_fn_single(video, text):
            s = text @ video.T  # (K, L)
            return {"sim": s, "dual-sim": 0.5 * s}

        def sim_fn_batched(video, vmask, text, tmask, interpolate_from=None):
            s = np.einsum("wnc,wlc->wnl", text, video)
            return {"sim": s, "dual-sim": 0.5 * s}

        cfg = AlignEvalConfig(sim_scale=1.0, window_chunk=7, text_bucket=4)
        got = run_alignment_htm(items, sim_fn_batched, cfg)
        ref = _naive_reference_protocol(items, sim_fn_single)
        np.testing.assert_allclose(got["Recall"], ref["Recall"], atol=1e-9)
        np.testing.assert_allclose(got["AUC"], ref["AUC"], atol=1e-9)

    def test_model_padding_invariance(self):
        """TemporalAligner batched padded windows == per-window unpadded calls."""
        model = TemporalAligner(
            num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
            max_pos=64, attn_impl="xla",
        )
        rng = np.random.RandomState(0)
        video = jnp.asarray(rng.randn(1, 20, 24).astype(np.float32))
        text = jnp.asarray(rng.randn(1, 3, 24).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), video, text,
                            jnp.zeros((1, 20), bool), jnp.zeros((1, 3), bool))

        # unpadded single window
        ref = model.apply(params, video, text, method=TemporalAligner.text_visual_sim)

        # padded: +12 pad frames, +2 pad texts, batched with a decoy window
        vpad = jnp.concatenate([video, jnp.ones((1, 12, 24))], axis=1)
        tpad = jnp.concatenate([text, jnp.zeros((1, 2, 24))], axis=1)
        vb = jnp.concatenate([vpad, vpad * 2.0], axis=0)
        tb = jnp.concatenate([tpad, tpad * 0.5], axis=0)
        vmask = jnp.asarray(np.array([[False] * 20 + [True] * 12] * 2))
        tmask = jnp.asarray(np.array([[False, False, False, True, True]] * 2))
        got = model.apply(
            params, vb, tb, video_padding_mask=vmask, lang_padding_mask=tmask,
            method=TemporalAligner.text_visual_sim,
        )
        np.testing.assert_allclose(
            np.asarray(got["sim"][0, :, :20, :3]),
            np.asarray(ref["sim"][0]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got["dual-sim"][0, :, :20, :3]),
            np.asarray(ref["dual-sim"][0]),
            atol=1e-5,
        )

    def test_end_to_end_with_tan_model(self):
        """Full stitcher over a real (tiny) TemporalAligner: runs, metrics sane."""
        model = TemporalAligner(
            num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
            max_pos=128, attn_impl="xla",
        )
        items = [_synthetic_video_item(s, vlen=150, dim=24) for s in range(2)]
        dummy_v = jnp.zeros((1, 8, 24))
        dummy_t = jnp.zeros((1, 2, 24))
        params = model.init(jax.random.PRNGKey(1), dummy_v, dummy_t,
                            jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool))
        sim_fn = make_tan_sim_fn(model, params)
        cfg = AlignEvalConfig()
        metrics = run_alignment_htm(items, sim_fn, cfg)
        assert 0.0 <= metrics["Recall"] <= 1.0
        assert 0.0 <= metrics["AUC"] <= 1.0

        g_metrics = run_alignment_htm(
            items, sim_fn, AlignEvalConfig(method="global")
        )
        assert 0.0 <= g_metrics["Recall"] <= 1.0


class TestFusedStitcher:
    def test_fused_matches_host_stitcher(self):
        """Device-resident fused eval == host-stitched eval on a real model."""
        from exoground_tpu.evals import test_alignment_htm_fused

        model = TemporalAligner(
            num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
            max_pos=128, attn_impl="xla",
        )
        items = [_synthetic_video_item(s, vlen=150, dim=24) for s in range(2)]
        params = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
            jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
        )
        cfg = AlignEvalConfig()
        host = run_alignment_htm(items, make_tan_sim_fn(model, params), cfg)
        fused = test_alignment_htm_fused(items, model, params, cfg)
        np.testing.assert_allclose(fused["Recall"], host["Recall"], atol=1e-9)
        np.testing.assert_allclose(fused["AUC"], host["AUC"], atol=1e-6)


def test_fused_grouping_invariance():
    """Packing 1, 3, or all videos per device call must not change metrics
    (validates the concatenated-timeline offset logic)."""
    import jax
    import jax.numpy as jnp

    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.models import TemporalAligner

    rng = np.random.RandomState(0)

    def item(seed, vlen):
        r = np.random.RandomState(seed)
        n = 6
        aligned = np.array([1, 0, 1, 0, 1, 1])
        centers = np.sort(r.rand(n)) * (vlen - 8) + 4
        return {
            "video": r.randn(vlen, 32).astype(np.float32),
            "start": np.maximum(centers - 3, 0),
            "end": np.minimum(centers + 3, vlen),
            "aligned": aligned,
            "text_embed": r.randn(n, 24).astype(np.float32),
        }

    items = [item(s, v) for s, v in enumerate([70, 90, 50, 80, 60])]
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    results = []
    for g in (1, 3, 8):
        cfg = AlignEvalConfig(seq_len=16, global_len_bucket=32, text_bucket=8,
                              group_videos=g)
        results.append(FusedAlignEvaluator(model, params, cfg)(items))
    for r in results[1:]:
        np.testing.assert_allclose(r["Recall"], results[0]["Recall"], atol=1e-9)
        np.testing.assert_allclose(r["AUC"], results[0]["AUC"], atol=1e-6)


def test_sim_fn_alignability_stages_match_reference_protocol():
    """Overlap-seq reads joint-head stage 2 ('3rd layer works the best',
    eval_zeroshot_align.py:186); global mode reads the LAST stage (:213).
    make_tan_sim_fn must expose both, sliced from the model's per-stage head
    outputs."""
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=4, width=32, heads=4,
        max_pos=64, use_alignability_head=1, random_pos_start=0,
        attn_impl="xla",
    )
    rng = np.random.RandomState(3)
    video = rng.randn(1, 16, 24).astype(np.float32)
    text = rng.randn(1, 5, 24).astype(np.float32)
    vmask = np.zeros((1, 16), bool)
    tmask = np.zeros((1, 5), bool)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(video), jnp.asarray(text),
        jnp.asarray(vmask), jnp.asarray(tmask),
    )
    out = model.apply(
        params, jnp.asarray(video), jnp.asarray(text),
        video_padding_mask=jnp.asarray(vmask), lang_padding_mask=jnp.asarray(tmask),
        method=type(model).text_visual_sim,
    )
    res = make_tan_sim_fn(model, params)(video, vmask, text, tmask)
    aj = np.asarray(out["alignability-joint"])  # (B, Stage, N, 1)
    assert aj.shape[1] == 4
    np.testing.assert_allclose(res["alignability-joint"], aj[:, 2, :, 0], rtol=1e-6)
    np.testing.assert_allclose(res["alignability-joint-last"], aj[:, -1, :, 0], rtol=1e-6)
    assert not np.allclose(aj[:, 2, :, 0], aj[:, -1, :, 0])  # distinct stages

    # and the global-mode runner consumes the LAST stage: a head-mode global
    # eval must produce AUC scores equal to the last-stage head outputs
    item = {
        "video": video[0], "start": np.array([1.0, 4.0, 8.0, 11.0, 14.0]),
        "end": np.array([3.0, 7.0, 10.0, 13.0, 16.0]),
        "aligned": np.array([1, 0, 1, 0, 1]),
        "text_embed": text[0],
    }
    cfg = AlignEvalConfig(method="global", use_alignability_head=True,
                          seq_len=16, global_len_bucket=16)
    host = run_alignment_htm([item], make_tan_sim_fn(model, params), cfg)
    assert np.isfinite(host["AUC"])


def test_fused_matches_host_on_zero_window_and_uncovered_videos():
    """Degenerate protocol cases must score identically in both evaluators
    (eval_zeroshot_align.py:222-241: an all-NEG_FILL canvas row softmaxes
    uniform and argmaxes to frame 0 — a HIT for a text starting in [0,1)):
    - a video whose texts are ALL aligned (no non-alignable midpoints -> zero
      active windows -> the fused plan emits a skip entry);
    - a video whose aligned texts are never covered by any window mask
      (non-alignable text only at index 0, early midpoints), placed at v0>0
      inside a fused group so the global argmax would land before the video.
    """
    from exoground_tpu.evals import test_alignment_htm_fused

    def normal_item(seed, vlen=60, n=6):
        r = np.random.RandomState(seed)
        aligned = np.array([1, 0, 1, 0, 1, 1])
        centers = np.sort(r.rand(n)) * (vlen - 8) + 4
        return {
            "video": r.randn(vlen, 24).astype(np.float32),
            "start": np.maximum(centers - 3, 0),
            "end": np.minimum(centers + 3, vlen),
            "aligned": aligned,
            "text_embed": r.randn(n, 24).astype(np.float32),
        }

    r = np.random.RandomState(7)
    all_aligned = {  # zero non-alignable texts -> zero windows -> skip
        "video": r.randn(50, 24).astype(np.float32),
        "start": np.array([0.5, 10.0, 30.0]),
        "end": np.array([3.0, 14.0, 35.0]),
        "aligned": np.array([1, 1, 1]),
        "text_embed": r.randn(3, 24).astype(np.float32),
    }
    uncovered = {  # non-alignable only at index 0 with an early midpoint:
        # every kept window's mask is [0..0], so aligned texts 1..3 have
        # all-NEG_FILL canvas rows (uncovered). Text 1 starts in [0,1) ->
        # host counts a hit; texts 2-3 start later -> misses.
        "video": r.randn(60, 24).astype(np.float32),
        "start": np.array([1.0, 0.5, 20.0, 40.0]),
        "end": np.array([3.0, 4.0, 25.0, 44.0]),
        "aligned": np.array([0, 1, 1, 1]),
        "text_embed": r.randn(4, 24).astype(np.float32),
    }
    items = [normal_item(0), all_aligned, uncovered]

    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    cfg = AlignEvalConfig(seq_len=16, global_len_bucket=32, text_bucket=8,
                          group_videos=4)
    host = run_alignment_htm(items, make_tan_sim_fn(model, params), cfg)
    fused = test_alignment_htm_fused(items, model, params, cfg)
    np.testing.assert_allclose(fused["Recall"], host["Recall"], atol=1e-9)
    np.testing.assert_allclose(fused["AUC"], host["AUC"], atol=1e-6)


def test_fused_alignability_head_matches_host():
    """VERDICT r1 #9: the fused evaluator serves the binary-alignability
    protocol (eval_zeroshot_align.py:197-204,225-229) — parity vs host path."""
    from exoground_tpu.evals import test_alignment_htm_fused

    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=128, attn_impl="xla", use_alignability_head=1,
    )
    items = [_synthetic_video_item(s, vlen=150, dim=24) for s in range(2)]
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    cfg = AlignEvalConfig(use_alignability_head=True)
    host = run_alignment_htm(items, make_tan_sim_fn(model, params), cfg)
    fused = test_alignment_htm_fused(items, model, params, cfg)
    np.testing.assert_allclose(fused["Recall"], host["Recall"], atol=1e-9)
    np.testing.assert_allclose(fused["AUC"], host["AUC"], atol=1e-6)


def test_fused_multi_device_round_robin_matches_single():
    """Multi-chip fused eval: video groups round-robin over local devices
    (async dispatch keeps all chips busy); metrics identical to 1-device."""
    from exoground_tpu.evals import FusedAlignEvaluator

    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    items = [_synthetic_video_item(s, vlen=130 + 7 * s, dim=24) for s in range(6)]
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    base = AlignEvalConfig(group_videos=2)
    single = FusedAlignEvaluator(model, params, base)(items)
    multi_cfg = AlignEvalConfig(group_videos=2, eval_devices=8)
    multi = FusedAlignEvaluator(model, params, multi_cfg)(items)
    np.testing.assert_allclose(multi["Recall"], single["Recall"], atol=1e-9)
    np.testing.assert_allclose(multi["AUC"], single["AUC"], atol=1e-7)


def test_global_mode_padded_interpolation_matches_unpadded():
    """Global mode pads the video axis to a length bucket; pos_interp_len
    must make real frames' positional embeddings identical to an unpadded
    pass (reference tan_model.py:151-154 resamples to the REAL length)."""
    from exoground_tpu.evals.align import make_tan_sim_fn
    from exoground_tpu.models import TemporalAligner

    rng = np.random.RandomState(11)
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=64, attn_impl="xla",
    )
    vlen, k, dv, dt = 90, 3, 24, 16  # longer than the 64-entry pos table
    video = rng.randn(1, vlen, dv).astype(np.float32)
    text = rng.randn(1, k, dt).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(video[:, :32]), jnp.asarray(text),
        jnp.zeros((1, 32), bool), jnp.zeros((1, k), bool),
    )
    sim_fn = make_tan_sim_fn(model, params)

    ref = sim_fn(video, np.zeros((1, vlen), bool), text,
                 np.zeros((1, k), bool), interpolate_from=64)

    pad_len = 128
    vb = np.zeros((1, pad_len, dv), np.float32)
    vb[0, :vlen] = video[0]
    vm = np.ones((1, pad_len), bool)
    vm[0, :vlen] = False
    padded = sim_fn(vb, vm, text, np.zeros((1, k), bool),
                    interpolate_from=64, pos_interp_len=vlen)

    np.testing.assert_allclose(
        padded["sim"][:, :, :vlen], ref["sim"], atol=2e-5
    )
    np.testing.assert_allclose(
        padded["dual-sim"][:, :, :vlen], ref["dual-sim"], atol=2e-5
    )


def test_fused_eval_int8_transfer_matches_f32():
    """transfer_dtype='int8' (per-row absmax quant + on-device dequant) must
    reproduce f32-transfer metrics to noise level: same R@1, AUC within 2%."""
    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.models import TemporalAligner

    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    items = [_synthetic_video_item(s, vlen=120 + 11 * s, dim=24) for s in range(4)]
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    base = AlignEvalConfig(group_videos=2)
    ref = FusedAlignEvaluator(model, params, base)(items)
    q = FusedAlignEvaluator(
        model, params, dataclasses.replace(base, transfer_dtype="int8")
    )(items)
    assert q["Recall"] == ref["Recall"], (q, ref)
    assert abs(q["AUC"] - ref["AUC"]) < 0.02, (q, ref)


def test_fused_eval_int4_transfer_characterization():
    """transfer_dtype='int4' is a documented-LOSSY bandwidth-emergency mode,
    not a quality-gated serving default (that is int8). This test pins the
    honest characterization: the inner-product SNR of quantized features
    equals the per-dim quantization SNR (no sqrt-D averaging — the inner
    product IS the average), so 4-bit group-absmax gives ~10-20% sim
    perturbation at any feature dim. Asserts (a) the mode runs end-to-end
    and produces sane metrics, (b) the sim perturbation stays within the
    measured ~25%-of-absmax envelope (a broken quantizer — wrong nibble
    order, scale misalignment — produces ~100%+), and (c) int8 sims stay
    an order of magnitude closer, justifying the int8-default advice in
    AlignEvalConfig."""
    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.evals.align_fused import (
        _dequant_int4, _quantize_rows, _quantize_rows_int4,
    )
    from exoground_tpu.models import TemporalAligner

    dim = 4096
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    items = [_synthetic_video_item(s, vlen=120 + 11 * s, dim=dim) for s in range(2)]
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, dim)), jnp.zeros((1, 2, dim)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    base = AlignEvalConfig(group_videos=2)
    ref = FusedAlignEvaluator(model, params, base)(items)
    q = FusedAlignEvaluator(
        model, params, dataclasses.replace(base, transfer_dtype="int4")
    )(items)
    assert np.isfinite(q["AUC"]) and abs(q["AUC"] - ref["AUC"]) < 0.1, (q, ref)

    item = items[0]
    video = item["video"][:64][None]
    text = item["text_embed"][:8][None]
    vq = np.asarray(_dequant_int4(*map(jnp.asarray, _quantize_rows_int4(video[0]))))[None]
    tq = np.asarray(_dequant_int4(*map(jnp.asarray, _quantize_rows_int4(text[0]))))[None]
    q8v, s8v = _quantize_rows(video[0])
    q8t, s8t = _quantize_rows(text[0])
    v8 = (q8v.astype(np.float32) * s8v[:, None])[None]
    t8 = (q8t.astype(np.float32) * s8t[:, None])[None]
    sim_fn = make_tan_sim_fn(model, params)
    zv, zt = np.zeros((1, 64), bool), np.zeros((1, 8), bool)
    s_ref = np.asarray(sim_fn(video, zv, text, zt)["sim"])
    d4 = np.abs(np.asarray(sim_fn(vq, zv, tq, zt)["sim"]) - s_ref).max()
    d8 = np.abs(np.asarray(sim_fn(v8, zv, t8, zt)["sim"]) - s_ref).max()
    scale = np.abs(s_ref).max()
    assert d4 < 0.25 * scale, (d4, scale)  # lossy but feature-preserving
    assert d8 < 0.05 * scale, (d8, scale)  # int8: quality-preserving point
    assert d8 < d4 / 3.0, (d8, d4)


def test_fused_eval_preloaded_matches_streaming():
    """preload + run_preloaded (HBM-resident features) must produce exactly
    the metrics of the streaming __call__ path, and survive a params swap
    (one preload serves many checkpoints)."""
    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.models import TemporalAligner

    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    items = [_synthetic_video_item(s, vlen=100 + 9 * s, dim=24) for s in range(3)]
    init_args = (
        jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    params = model.init(jax.random.PRNGKey(1), *init_args)
    cfg = AlignEvalConfig(group_videos=2, transfer_dtype="float16")
    ev = FusedAlignEvaluator(model, params, cfg)
    ref = ev(items)
    pre = ev.preload(items)
    res = ev.run_preloaded(pre)
    assert res == ref, (res, ref)

    params2 = model.init(jax.random.PRNGKey(2), *init_args)
    ev.update_params(params2)
    ref2 = ev(items)
    res2 = ev.run_preloaded(pre)  # same resident buffers, new weights
    assert res2 == ref2, (res2, ref2)
    assert res2 != ref  # weights actually changed the metrics


def test_int4_quantize_roundtrip_accuracy():
    """Unit-level: pack/unpack inverts exactly and the quantization error is
    bounded by half a step per group (absmax/7/2 -> ~7% of group absmax)."""
    from exoground_tpu.evals.align_fused import (
        _dequant_int4, _int4_group, _quantize_rows_int4,
    )

    rng = np.random.RandomState(3)
    x = (rng.randn(6, 256) * np.exp(rng.randn(6, 1))).astype(np.float32)
    packed, scale = _quantize_rows_int4(x)
    assert packed.shape == (6, 128) and scale.shape == (6, 256 // _int4_group(256))
    deq = np.asarray(_dequant_int4(jnp.asarray(packed), jnp.asarray(scale)))
    g = _int4_group(256)
    step = scale.astype(np.float32).repeat(g, axis=1)
    assert np.all(np.abs(deq - x) <= 0.5 * step + 1e-6)
    # padding byte 0x88 decodes to exact zeros
    z = np.asarray(_dequant_int4(
        jnp.full((2, 4), 0x88, jnp.uint8), jnp.ones((2, 1), jnp.float16)
    ))
    assert np.all(z == 0.0)


def test_fused_lowering_switches_match_default():
    """BLOCK_GATHER / MATMUL_FOLD are pure lowering changes: identical
    metrics for every transfer dtype (incl. the reshaped dequant-scale
    gathers) on every switch combination."""
    from exoground_tpu.evals import align_fused
    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.models import TemporalAligner

    def item(seed, vlen):
        r = np.random.RandomState(seed)
        n = 6
        aligned = np.array([1, 0, 1, 0, 1, 1])
        centers = np.sort(r.rand(n)) * (vlen - 8) + 4
        return {
            "video": r.randn(vlen, 32).astype(np.float32),
            "start": np.maximum(centers - 3, 0),
            "end": np.minimum(centers + 3, vlen),
            "aligned": aligned,
            "text_embed": r.randn(n, 32).astype(np.float32),
        }

    items = [item(s, v) for s, v in enumerate([70, 90, 50, 77])]
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 32)), jnp.zeros((1, 2, 32)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    orig = (align_fused.BLOCK_GATHER, align_fused.MATMUL_FOLD)
    try:
        results = {}
        for bg in (False, True):
            for mf in (False, True):
                align_fused.BLOCK_GATHER, align_fused.MATMUL_FOLD = bg, mf
                for dt in ("float32", "float16", "int8", "int4"):
                    cfg = AlignEvalConfig(
                        seq_len=16, global_len_bucket=32, text_bucket=8,
                        group_videos=4, transfer_dtype=dt,
                    )
                    res = FusedAlignEvaluator(model, params, cfg)(items)
                    if (dt) not in results:
                        results[dt] = res
                    else:
                        base = results[dt]
                        np.testing.assert_allclose(
                            res["Recall"], base["Recall"], atol=1e-9,
                            err_msg=f"{bg=} {mf=} {dt=}")
                        np.testing.assert_allclose(
                            res["AUC"], base["AUC"], atol=1e-5,
                            err_msg=f"{bg=} {mf=} {dt=}")
    finally:
        align_fused.BLOCK_GATHER, align_fused.MATMUL_FOLD = orig


def test_run_many_matches_sequential_update_params():
    """run_many (one scanned dispatch per group for k checkpoints) ==
    update_params + run_preloaded per checkpoint, including skip entries
    (zero-window videos) and multi-group plans."""
    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.models import TemporalAligner

    def item(seed, vlen):
        r = np.random.RandomState(seed)
        n = 5
        aligned = np.array([1, 0, 1, 1, 0])
        centers = np.sort(r.rand(n)) * max(vlen - 6, 1) + 2
        return {
            "video": r.randn(vlen, 24).astype(np.float32),
            "start": np.maximum(centers - 2, 0),
            "end": np.minimum(centers + 2, vlen),
            "aligned": aligned,
            "text_embed": r.randn(n, 24).astype(np.float32),
        }

    # vlen=6 (< seq_len//2=8): exercises the one-window fallback; 3 groups
    items = [item(s, v) for s, v in enumerate([60, 6, 72, 48, 90])]
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    init_args = (jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)),
                 jnp.zeros((1, 2, 24)), jnp.zeros((1, 8), bool),
                 jnp.zeros((1, 2), bool))
    params_list = [model.init(jax.random.PRNGKey(s), *init_args[1:])
                   for s in (0, 1, 2)]
    cfg = AlignEvalConfig(seq_len=16, global_len_bucket=32, text_bucket=8,
                          group_videos=2)
    ev = FusedAlignEvaluator(model, params_list[0], cfg)
    pre = ev.preload(items)
    many = ev.run_many(pre, params_list)
    assert len(many) == 3
    for p, got in zip(params_list, many):
        ev.update_params(p)
        ref = ev.run_preloaded(pre)
        assert got == ref, (got, ref)
    # distinct checkpoints actually produce distinct metrics
    assert len({(m["Recall"], m["AUC"]) for m in many}) > 1
    assert ev.run_many(pre, []) == []
    with np.testing.assert_raises(ValueError):
        bad = dict(params_list[0]); bad = {"params": {}}
        ev.run_many(pre, [params_list[0], bad])
    # the split dispatch/reduce halves (serving pipeline shape) and a
    # pre-built StackedCheckpoints both reproduce run_many exactly
    stacked = ev.stack_checkpoints(params_list)
    assert ev.run_many(pre, stacked) == many
    pendings = ev.dispatch_many(pre, stacked)
    assert [ev.reduce_preloaded(p, pre) for p in pendings] == many
    with np.testing.assert_raises(ValueError):
        ev.stack_checkpoints([])
    # the k pendings of one group share ONE device fetch: slicing outs[i]
    # on device paid a dispatch + D2H round trip per checkpoint (~25 ms
    # each on the session tunnel — the round-4 50-vs-27 ms/sweep finding)
    from exoground_tpu.evals.align_fused import _StackRow

    rows = [rec[-1] for p in pendings for rec in p if rec[-1] is not None]
    assert rows and all(isinstance(r, _StackRow) for r in rows)
    by_stack = {}
    for r in rows:
        by_stack.setdefault(id(r._stack), set()).add(id(r._cache))
    # every row of one stacked result shares the same host cache dict
    assert all(len(caches) == 1 for caches in by_stack.values()), by_stack
    one = rows[0]
    first = np.asarray(one)
    assert "host" in one._cache  # materialized into the shared cache
    one._cache["host"] = one._cache["host"] * 0 + 7.0  # poison: no refetch
    np.testing.assert_array_equal(np.asarray(one), np.full_like(first, 7.0))


def test_fused_eval_int8_compute_matches_f32():
    """matmul_dtype='int8' (dynamic int8 projections/MLPs, ops/quant.py) is
    the opt-in MXU-rate serving mode: R@1 must match and AUC stay within
    noise (2%) of the unquantized run; the default-context programs stay
    bit-identical (checked by comparing a default evaluator built AFTER an
    int8 one ever traced)."""
    from exoground_tpu.evals import AlignEvalConfig, FusedAlignEvaluator
    from exoground_tpu.models import TemporalAligner

    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    items = [_synthetic_video_item(s, vlen=120 + 11 * s, dim=24) for s in range(4)]
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    base = AlignEvalConfig(group_videos=2)
    ref = FusedAlignEvaluator(model, params, base)(items)
    q = FusedAlignEvaluator(
        model, params, dataclasses.replace(base, matmul_dtype="int8")
    )(items)
    assert q["Recall"] == ref["Recall"], (q, ref)
    assert abs(q["AUC"] - ref["AUC"]) < 0.02, (q, ref)
    assert q["AUC"] != ref["AUC"]  # the math really is quantized
    # tracing the int8 program must not leak into later default evaluators
    ref2 = FusedAlignEvaluator(model, params, base)(items)
    assert ref2 == ref, (ref2, ref)
    # int8_min_cols above every matmul width (3*32=96 is the widest here)
    # = every matmul falls through to the exact lowering: bit-identical
    # metrics to the default evaluator (the selective-quantization plumb)
    q_none = FusedAlignEvaluator(
        model, params,
        dataclasses.replace(base, matmul_dtype="int8", int8_min_cols=4096),
    )(items)
    assert q_none == ref, (q_none, ref)


def test_run_queries_matches_per_batch_evaluation():
    """run_queries (one scanned dispatch per group for q query batches over
    ONE resident corpus) == evaluating each batch alone through the skip-
    entry streaming path — including a batch where a video activates ZERO
    windows (all texts aligned -> keep_empty packing vs the 'skip' entry),
    multi-group plans, varying per-batch text counts, and quantized
    transfer dtypes."""
    from exoground_tpu.evals import FusedAlignEvaluator
    from exoground_tpu.evals import align_fused

    def batch(seed, videos, all_aligned_video=None):
        """Same videos, fresh texts per seed; optionally make one video's
        texts all-aligned (zero non-alignable texts -> zero windows)."""
        r = np.random.RandomState(seed)
        out = []
        for vi, video in enumerate(videos):
            vlen = video.shape[0]
            n = int(r.randint(4, 9))
            if vi == all_aligned_video:
                aligned = np.ones(n, np.int64)
            else:
                aligned = (r.rand(n) > 0.4).astype(np.int64)
                aligned[0], aligned[-1] = 1, 0
            centers = np.sort(r.rand(n)) * max(vlen - 6, 1) + 2
            out.append({
                "video": video,
                "start": np.maximum(centers - 2, 0),
                "end": np.minimum(centers + 2, vlen),
                "aligned": aligned,
                "text_embed": r.randn(n, 24).astype(np.float32),
            })
        return out

    rng = np.random.RandomState(7)
    videos = [rng.randn(v, 24).astype(np.float32) for v in (60, 6, 72, 48, 90)]
    batches = [
        batch(0, videos),
        batch(1, videos, all_aligned_video=1),  # video 1: zero windows
        batch(2, videos),
    ]
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    for dt in ("float32", "int8", "int4"):
        cfg = AlignEvalConfig(seq_len=16, global_len_bucket=32, text_bucket=8,
                              group_videos=2, transfer_dtype=dt)
        ev = FusedAlignEvaluator(model, params, cfg)
        pq = ev.preload_queries(batches)
        got = ev.run_queries(pq)
        ref = [ev(b) for b in batches]
        for g, r, b in zip(got, ref, batches):
            assert g["Recall"] == r["Recall"], (dt, g, r)
            np.testing.assert_allclose(g["AUC"], r["AUC"], atol=1e-6,
                                       err_msg=f"{dt}")
        # distinct query batches produce distinct metrics
        assert len({(m["Recall"], m["AUC"]) for m in got}) > 1
    # split dispatch/reduce halves reproduce run_queries exactly
    cfg = AlignEvalConfig(seq_len=16, global_len_bucket=32, text_bucket=8,
                          group_videos=2)
    ev = FusedAlignEvaluator(model, params, cfg)
    pq = ev.preload_queries(batches)
    got = ev.run_queries(pq)
    pendings = ev.dispatch_queries(pq)
    assert [ev.reduce_preloaded(p, pq) for p in pendings] == got
    # the q pendings of one group share ONE device fetch
    outs = {id(rec[-1]._stack) for p in pendings for rec in p
            if rec[-1] is not None}
    n_groups = sum(1 for e in pq.entries if e[0] == "group")
    assert len(outs) == n_groups
    # validation: a different corpus is rejected
    other = [dict(it, video=it["video"] + 1.0) for it in batches[0]]
    with pytest.raises(ValueError):
        ev.preload_queries([batches[0], other])
    with pytest.raises(ValueError):
        ev.preload_queries([])


def test_run_queries_head_mode_and_multi_device():
    """Query-batch scan parity with the alignability-head protocol and with
    groups round-robined over 2 devices (the virtual CPU mesh)."""
    from exoground_tpu.evals import FusedAlignEvaluator

    def batch(seed, videos):
        r = np.random.RandomState(seed)
        out = []
        for video in videos:
            vlen = video.shape[0]
            n = 5
            aligned = (r.rand(n) > 0.4).astype(np.int64)
            aligned[0], aligned[-1] = 1, 0
            centers = np.sort(r.rand(n)) * max(vlen - 6, 1) + 2
            out.append({
                "video": video,
                "start": np.maximum(centers - 2, 0),
                "end": np.minimum(centers + 2, vlen),
                "aligned": aligned,
                "text_embed": r.randn(n, 24).astype(np.float32),
            })
        return out

    rng = np.random.RandomState(3)
    videos = [rng.randn(v, 24).astype(np.float32) for v in (60, 48, 72, 36)]
    batches = [batch(s, videos) for s in range(3)]
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=128, attn_impl="xla", use_alignability_head=1,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    for head in (True, False):
        for n_dev in (1, 2):
            cfg = AlignEvalConfig(
                seq_len=16, global_len_bucket=32, text_bucket=8,
                group_videos=2, use_alignability_head=head,
                eval_devices=n_dev,
            )
            ev = FusedAlignEvaluator(model, params, cfg)
            got = ev.run_queries(ev.preload_queries(batches))
            ref = [ev(b) for b in batches]
            for g, r in zip(got, ref):
                assert g["Recall"] == r["Recall"], (head, n_dev, g, r)
                np.testing.assert_allclose(g["AUC"], r["AUC"], atol=1e-6)


def test_predict_queries_matches_streaming_predict():
    """predict_queries (scanned q-request predictions over the resident
    corpus) == predict(batch) per batch — including the documented
    align_score edge on a zero-window video (fused canvas 0 vs the
    streaming skip entry's NEG_FILL sentinel; 'score' carries the sentinel
    on both paths). Also exercises AlignmentService.align_query_batches."""
    from exoground_tpu.evals import FusedAlignEvaluator
    from exoground_tpu.evals.align import NEG_FILL
    from exoground_tpu.serve import AlignmentService

    rng = np.random.RandomState(11)
    videos = [rng.randn(v, 24).astype(np.float32) for v in (60, 6, 72)]

    def batch(seed, zero_window_video=None):
        r = np.random.RandomState(seed)
        out = []
        for vi, video in enumerate(videos):
            vlen, n = video.shape[0], 5
            if vi == zero_window_video:
                aligned = np.ones(n, np.int64)  # no non-alignable -> no windows
            else:
                aligned = np.array([1, 0, 1, 1, 0])
            centers = np.sort(r.rand(n)) * max(vlen - 6, 1) + 2
            out.append({
                "video": video,
                "start": np.maximum(centers - 2, 0),
                "end": np.minimum(centers + 2, vlen),
                "aligned": aligned,
                "text_embed": r.randn(n, 24).astype(np.float32),
            })
        return out

    batches = [batch(0), batch(1, zero_window_video=1), batch(2)]
    model = TemporalAligner(
        num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    cfg = AlignEvalConfig(seq_len=16, global_len_bucket=32, text_bucket=8,
                          group_videos=2)
    ev = FusedAlignEvaluator(model, params, cfg)
    got = ev.predict_queries(ev.preload_queries(batches))
    assert len(got) == 3 and all(len(g) == len(videos) for g in got)
    for bi, b in enumerate(batches):
        ref = ev.predict(b)
        for vi, (g, r) in enumerate(zip(got[bi], ref)):
            sentinel = r["score"] <= NEG_FILL * 0.5
            np.testing.assert_allclose(g["score"], r["score"], atol=1e-5,
                                       err_msg=f"{bi=} {vi=}")
            # argmax: meaningful only off the sentinel (docstring contract)
            np.testing.assert_array_equal(
                g["argmax"][~sentinel], r["argmax"][~sentinel])
            if bi == 1 and vi == 1:  # zero-window video: documented edge
                assert np.all(sentinel)
                np.testing.assert_array_equal(g["align_score"], 0.0)
                np.testing.assert_array_equal(r["align_score"], NEG_FILL)
            else:
                np.testing.assert_allclose(
                    g["align_score"], r["align_score"], atol=1e-5)
    # the AlignmentService wrapper serves the same shape
    svc = AlignmentService(model, params, seq_len=16,
                           transfer_dtype="float32")
    svc.cfg = cfg
    from exoground_tpu.evals import FusedAlignEvaluator as _FE
    svc._evaluator = _FE(model, params, cfg)
    out = svc.align_query_batches(batches)
    for a, b in zip(out, got):
        for da, db in zip(a, b):
            np.testing.assert_allclose(da["score"], db["score"], atol=1e-5)


def test_preproject_resident_matches_unsplit():
    """cfg.preproject (position-independent input stages run once at
    preload, resident buffers become width-d) == the unsplit evaluator on
    metrics and predictions, for every transfer dtype, head on/off, and the
    query-batch path; params-pinning and streaming guards raise."""
    from exoground_tpu.evals import FusedAlignEvaluator
    from exoground_tpu.evals.bench_items import make_query_batch

    def items_for(head):
        r = np.random.RandomState(5 + head)
        out = []
        for vlen in (60, 6, 72, 48, 90):
            n = 6
            aligned = np.array([1, 0, 1, 1, 0, 1])
            centers = np.sort(r.rand(n)) * max(vlen - 6, 1) + 2
            out.append({
                "video": r.randn(vlen, 24).astype(np.float32),
                "start": np.maximum(centers - 2, 0),
                "end": np.minimum(centers + 2, vlen),
                "aligned": aligned,
                "text_embed": r.randn(n, 24).astype(np.float32),
            })
        return out

    for head in (0, 1):
        model = TemporalAligner(
            num_encoder_layers=1, num_joint_layers=1, width=32, heads=4,
            max_pos=128, attn_impl="xla", use_alignability_head=head,
        )
        params = model.init(
            jax.random.PRNGKey(head), jnp.zeros((1, 8, 24)),
            jnp.zeros((1, 2, 24)), jnp.zeros((1, 8), bool),
            jnp.zeros((1, 2), bool),
        )
        items = items_for(head)
        for dt in ("float32", "float16", "int8", "int4"):
            base = AlignEvalConfig(
                seq_len=16, global_len_bucket=32, text_bucket=8,
                group_videos=2, transfer_dtype=dt,
                use_alignability_head=bool(head),
            )
            ev = FusedAlignEvaluator(model, params, base)
            pp = FusedAlignEvaluator(
                model, params, dataclasses.replace(base, preproject=True)
            )
            ref = ev.run_preloaded(ev.preload(items))
            got = pp.run_preloaded(pp.preload(items))
            assert got["Recall"] == ref["Recall"], (head, dt, got, ref)
            np.testing.assert_allclose(got["AUC"], ref["AUC"], atol=1e-5,
                                       err_msg=f"{head=} {dt=}")
    # predictions + query batches (f32)
    model = TemporalAligner(num_encoder_layers=1, num_joint_layers=1,
                            width=32, heads=4, max_pos=128, attn_impl="xla")
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    items = items_for(0)
    base = AlignEvalConfig(seq_len=16, global_len_bucket=32, text_bucket=8,
                           group_videos=2)
    ev = FusedAlignEvaluator(model, params, base)
    pp = FusedAlignEvaluator(model, params,
                             dataclasses.replace(base, preproject=True))
    qb = [make_query_batch(items, s) for s in range(3)]
    got_q = pp.run_queries(pp.preload_queries(qb))
    ref_q = ev.run_queries(ev.preload_queries(qb))
    for g, r in zip(got_q, ref_q):
        assert g["Recall"] == r["Recall"], (g, r)
        np.testing.assert_allclose(g["AUC"], r["AUC"], atol=1e-5)
    preds_pp = pp.predict_queries(pp.preload_queries(qb))
    preds = ev.predict_queries(ev.preload_queries(qb))
    for bp, br in zip(preds_pp, preds):
        for dp, dr in zip(bp, br):
            np.testing.assert_allclose(dp["score"], dr["score"],
                                       atol=1e-4, rtol=1e-4)
            np.testing.assert_array_equal(dp["argmax"], dr["argmax"])
    # guards: streaming paths have no preload to amortize into
    with pytest.raises(ValueError):
        pp(items)
    with pytest.raises(ValueError):
        pp.predict(items)
    # params pin: preprojected buffers bake in the checkpoint
    pre = pp.preload(items)
    params2 = model.init(
        jax.random.PRNGKey(9), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    pp.update_params(params2)
    with pytest.raises(ValueError):
        pp.run_preloaded(pre)
    pp.update_params(params)
    pp.run_preloaded(pre)  # original params: still valid
    # run_many rejects preprojected handles outright
    with pytest.raises(ValueError):
        pp.run_many(pre, [params, params2])
    # non-preprojected preloads stay params-agnostic
    ev.update_params(params2)
    ev.run_preloaded(ev.preload(items))


def test_preproject_int8_compute_combined():
    """preproject + matmul_dtype='int8' composed (bench.py's
    resident_preproj_int8_fps row — the fastest measured serving mode,
    PERF.md round-4 item 9): R@1 must match the exact run and AUC stay
    within int8 noise (2%), same bars as the int8-alone test; and with
    int8_min_cols above every width the combined evaluator falls back to
    exact math == the preproject-alone metrics bit-for-bit."""
    from exoground_tpu.evals import FusedAlignEvaluator

    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=128, attn_impl="xla",
    )
    items = [_synthetic_video_item(s, vlen=120 + 11 * s, dim=24)
             for s in range(4)]
    params = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 24)), jnp.zeros((1, 2, 24)),
        jnp.zeros((1, 8), bool), jnp.zeros((1, 2), bool),
    )
    base = AlignEvalConfig(group_videos=2)
    ev = FusedAlignEvaluator(model, params, base)
    ref = ev.run_preloaded(ev.preload(items))
    both = FusedAlignEvaluator(
        model, params,
        dataclasses.replace(base, preproject=True, matmul_dtype="int8"),
    )
    got = both.run_preloaded(both.preload(items))
    assert got["Recall"] == ref["Recall"], (got, ref)
    assert abs(got["AUC"] - ref["AUC"]) < 0.02, (got, ref)
    assert got["AUC"] != ref["AUC"]  # the math really is quantized
    # selective fall-through: min_cols above the widest matmul = exact
    # lowering everywhere -> bit-identical to preproject-alone
    pp = FusedAlignEvaluator(
        model, params, dataclasses.replace(base, preproject=True)
    )
    pp_ref = pp.run_preloaded(pp.preload(items))
    none = FusedAlignEvaluator(
        model, params,
        dataclasses.replace(base, preproject=True, matmul_dtype="int8",
                            int8_min_cols=4096),
    )
    got_none = none.run_preloaded(none.preload(items))
    assert got_none == pp_ref, (got_none, pp_ref)

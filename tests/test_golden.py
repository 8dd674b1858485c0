"""Self-contained numeric-parity regression against committed golden fixtures.

Unlike tests/test_oracle_*.py (which skip when /root/reference is unmounted),
these run ANYWHERE: the fixtures under tests/golden/ carry the reference
implementation's outputs for deterministic seeded weights and inputs
(tests/golden_common.py), generated once by
exoground_tpu/tools/gen_golden_fixtures.py. Drift in utils/convert.py,
ops/blocks.py, ops/pos_embed.py, models/aligner.py, models/grounding.py,
losses/milnce.py or losses/grounding.py fails here without torch or the
reference tree."""

import os

import numpy as np
import pytest

from tests import golden_common as G

needs = pytest.mark.skipif(
    not os.path.isdir(G.GOLDEN_DIR), reason="golden fixtures not generated"
)
pytestmark = needs


def _rel(a, r):
    return np.abs(np.asarray(a) - r).max() / (np.abs(r).max() + 1e-8)


@pytest.fixture(scope="module")
def tan_fixture():
    z = np.load(os.path.join(G.GOLDEN_DIR, "tan_forward.npz"))
    state = G.synth_state(G.manifest_from_npz(z), seed=7)
    return z, state


@pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
def test_golden_tan_forward(tan_fixture):
    import jax.numpy as jnp

    from exoground_tpu.models import TemporalAligner
    from exoground_tpu.utils.convert import convert_tan_state_dict

    z, state = tan_fixture
    params = convert_tan_state_dict(state)
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2,
        use_alignability_head=1, attn_impl="xla",
    )
    video, lang, vmask, lmask = G.tan_forward_inputs()
    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(lang),
        jnp.asarray(vmask), jnp.asarray(lmask), deterministic=True,
    )
    for key in ("logits_dual", "logits_joint", "dual_logits_alignability",
                "joint_logits_alignability"):
        r = z[f"out::{key}"]
        a = np.asarray(out[key])
        assert a.shape == r.shape, (key, a.shape, r.shape)
        assert _rel(a, r) < 2e-4, (key, _rel(a, r))


@pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
def test_golden_tan_eval_entry_points(tan_fixture):
    import jax.numpy as jnp

    from exoground_tpu.models import TemporalAligner
    from exoground_tpu.utils.convert import convert_tan_state_dict

    z, state = tan_fixture
    params = convert_tan_state_dict(state)
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2,
        use_alignability_head=1, attn_impl="xla",
    )
    video, lang = G.tan_eval_inputs()
    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(lang),
        method=TemporalAligner.text_visual_sim,
    )
    for ours_key, ref_key in (("sim", "eval_sim_joint"),
                              ("dual-sim", "eval_sim_dual")):
        r = z[f"out::{ref_key}"]
        a = np.asarray(out[ours_key]).reshape(r.shape)
        assert _rel(a, r) < 2e-4, (ours_key, _rel(a, r))


@pytest.mark.slow  # E6D6 @ T=64/200 with 4096-d inputs: compile-heavy
def test_golden_tan_forward_fullscale():
    """FULL-SCALE drift gate (VERDICT r3 missing-#3): E6D6 / width 512 /
    8x64 head split / 4096-d inputs / text pos-enc, plus both eval entries
    and the alignability entry at a 200-frame global-mode shape with video
    AND text pos tables interpolated from the full 4096 rows — the
    real-scale paths previously covered only while torch + /root/reference
    were mounted."""
    import jax.numpy as jnp

    from exoground_tpu.models import TemporalAligner
    from exoground_tpu.utils.convert import convert_tan_state_dict

    z = np.load(os.path.join(G.GOLDEN_DIR, "tan_forward_fullscale.npz"))
    state = G.synth_state(G.manifest_from_npz(z), seed=17)
    params = convert_tan_state_dict(state)
    model = TemporalAligner(
        num_encoder_layers=6, num_joint_layers=6,
        use_alignability_head=1, use_text_pos_enc=1, attn_impl="xla",
    )

    video, lang, vmask, lmask = G.tan_fullscale_inputs()
    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(lang),
        jnp.asarray(vmask), jnp.asarray(lmask), deterministic=True,
    )
    for key in ("logits_dual", "logits_joint", "dual_logits_alignability",
                "joint_logits_alignability"):
        r = z[f"out::{key}"]
        a = np.asarray(out[key])
        assert a.shape == r.shape, (key, a.shape, r.shape)
        assert _rel(a, r) < 2e-4, (key, _rel(a, r))

    ev_video, ev_lang = G.tan_fullscale_eval_inputs()
    ev = model.apply(
        {"params": params}, jnp.asarray(ev_video), jnp.asarray(ev_lang),
        method=TemporalAligner.text_visual_sim,
        interpolate_from=(4096, 4096),
    )
    for ours_key, ref_key in (
        ("sim", "eval_sim_joint"),
        ("dual-sim", "eval_sim_dual"),
        ("alignability-dual", "eval_alignability_dual"),
        ("alignability-joint", "eval_alignability_joint"),
    ):
        r = z[f"out::{ref_key}"]
        a = np.asarray(ev[ours_key]).reshape(r.shape)
        assert _rel(a, r) < 2e-4, (ours_key, _rel(a, r))


@pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
def test_golden_exoground_forward():
    import jax.numpy as jnp

    from exoground_tpu.models import ExoGroundingTransformer
    from exoground_tpu.utils.convert import convert_exoground_state_dict

    z = np.load(os.path.join(G.GOLDEN_DIR, "exoground_forward.npz"))
    state = G.synth_state(G.manifest_from_npz(z), seed=11)
    params = convert_exoground_state_dict(state)
    model = ExoGroundingTransformer(
        num_encoder_layers=2, num_decoder_layers=2,
        video_embed_dim=64, text_embed_dim=64, feature_dim=128,
        attn_impl="xla",
    )
    video, lang, vmask, lmask = G.exoground_inputs()
    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(lang),
        jnp.asarray(vmask), jnp.asarray(lmask), deterministic=True,
    )
    r = z["out::interval_preds"]
    a = np.asarray(out["interval_preds"])
    assert a.shape == r.shape
    assert _rel(a, r) < 2e-4, _rel(a, r)


@pytest.mark.parametrize(
    "model,agreement,threshold,align_head,agree_type", G.TAN_LOSS_CONFIGS
)
def test_golden_tan_loss(model, agreement, threshold, align_head, agree_type):
    from exoground_tpu.losses.milnce import TANLossConfig, tan_loss

    z = np.load(os.path.join(G.GOLDEN_DIR, "tan_loss.npz"))
    seed = G.TAN_LOSS_SEEDS[agree_type]
    (ld, lj, ed, ej, starts, ends, text_pad, video_pad,
     a_dual, a_joint, abs_pos) = G.tan_loss_inputs(seed=seed)
    b, s, t, _, n = ld.shape
    start_arr = np.full((b, n), t + 100.0, np.float32)
    end_arr = np.full((b, n), -100.0, np.float32)
    for i in range(b):
        start_arr[i, : len(starts[i])] = starts[i]
        end_arr[i, : len(ends[i])] = ends[i]
    cfg = TANLossConfig(
        model=model, sim="cos", learn_agreement=bool(agreement),
        temporal_agreement_type=agree_type, loss_threshold=threshold,
        use_alignability_head=bool(align_head),
    )
    logits = {
        "logits_dual": ld, "logits_joint": lj,
        "dual_logits_alignability": a_dual,
        "joint_logits_alignability": np.repeat(a_joint, 3, axis=1)[:, :3],
    }
    if model == "cotrain":
        logits["ema-logits_dual"] = ed
        logits["ema-logits_joint"] = ej
    ours = tan_loss(
        start_arr, end_arr, logits, video_pad, text_pad, cfg,
        abs_text_pos=abs_pos,
    )
    tag = f"{model}_{agreement}_{threshold}_{align_head}_{agree_type}"
    for key in ("loss", "loss-dual", "loss-joint"):
        r = float(z[f"{tag}::{key}"])
        o = float(ours[key])
        assert abs(o - r) / (abs(r) + 1e-6) < 2e-4, (key, o, r)
    if agreement:
        assert abs(
            float(ours["confidence-ratio"]) - float(z[f"{tag}::confidence-ratio"])
        ) < 1e-5
    if align_head:
        r = float(z[f"{tag}::loss-joint-bce"])
        assert abs(float(ours["loss-joint-bce"]) - r) / (abs(r) + 1e-6) < 2e-4


@pytest.mark.parametrize("center_duration", [True, False])
def test_golden_grounding_regression(center_duration):
    from exoground_tpu.losses.grounding import GroundingLossConfig, grounding_loss

    z = np.load(os.path.join(G.GOLDEN_DIR, "grounding_loss.npz"))
    preds, starts, ends, pad, t = G.grounding_loss_inputs()
    cfg = GroundingLossConfig(
        use_center_duration=center_duration, iou_loss_eps=1e-8,
        iou_thresholds=(0.1, 0.3, 0.5, 0.7),
    )
    targets = {
        "mean": (starts + ends) / 2, "duration": np.abs(ends - starts),
        "starts": starts, "ends": ends,
    }
    ours, iou_map = grounding_loss(preds, targets, pad, cfg)
    tag = "cd" if center_duration else "se"
    for key in ("loss", "IoU loss", "mean IoU", "IoU>=0.3", "IoU>=0.5"):
        r = float(z[f"{tag}::{key}"])
        assert abs(float(ours[key]) - r) < 2e-5, (key, float(ours[key]), r)
    np.testing.assert_allclose(
        np.asarray(iou_map)[~pad], z[f"{tag}::iou_map"], atol=1e-5
    )


@pytest.mark.parametrize("same_view", [False, True])
def test_golden_vi_infonce(same_view):
    from exoground_tpu.losses.infonce import cross_view_info_nce, l1_cosine_metrics

    z = np.load(os.path.join(G.GOLDEN_DIR, "grounding_loss.npz"))
    feats, ego, pos, neg, svn_idx, video_feats = G.vi_infonce_inputs()
    svn_feats = (
        np.take_along_axis(video_feats, svn_idx[..., None], axis=1)
        if same_view else None
    )
    ours = np.asarray(cross_view_info_nce(
        feats, ego, pos, neg, same_view_neg_feats=svn_feats,
        only_same_view_negative=False,
    ))
    np.testing.assert_allclose(
        ours, z[f"vi_{int(same_view)}::nce"], rtol=2e-4, atol=1e-5
    )
    l1, pc, nc = l1_cosine_metrics(feats, ego, pos, neg)
    np.testing.assert_allclose(np.asarray(l1), z["vi::l1"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pc), z["vi::pos_cos"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nc), z["vi::neg_cos"], rtol=1e-4, atol=1e-5)


def test_golden_vi_encoder_forward():
    """Transformer ViewInvariantEncoder (multi-view pos tiling) against the
    committed reference outputs — covers convert_vi_encoder_state_dict,
    the seq_len = T//num_max_views pos slice, and the stage-mean protocol."""
    import jax.numpy as jnp

    from exoground_tpu.models.vi_encoder import ViewInvariantEncoder
    from exoground_tpu.utils.convert import convert_vi_encoder_state_dict

    z = np.load(os.path.join(G.GOLDEN_DIR, "vi_forward.npz"))
    state = G.synth_state(G.manifest_from_npz(z), seed=13)
    params = convert_vi_encoder_state_dict(state)
    model = ViewInvariantEncoder(
        num_encoder_layers=2, random_pos_start=0, video_embed_dim=48,
        feature_dim=32, use_distill_nce_loss=True, num_max_views=2,
        attn_impl="xla",
    )
    video, ego = G.vi_encoder_inputs()
    b, t = video.shape[:2]
    out = model.apply(
        {"params": params}, jnp.asarray(video), None,
        jnp.zeros((b, t), bool), None,
        egocentric_video_embed=jnp.asarray(ego), deterministic=True,
    )
    for key in ("low_dim_features", "high_dim_features"):
        assert _rel(out[key], z[f"out::{key}"]) < 2e-5, key


def test_golden_word2vec_forward():
    """Frozen word2vec text tower (word2vec_model.py:84-102) against the
    committed reference outputs — covers convert_word2vec_from_s3d, the
    masked max-pool, and the all-stop-word escape hatch (:95)."""
    import jax.numpy as jnp

    from exoground_tpu.models.word2vec import word2vec_forward
    from exoground_tpu.utils.convert import convert_word2vec_from_s3d

    z = np.load(os.path.join(G.GOLDEN_DIR, "word2vec.npz"))
    state = G.synth_state(G.manifest_from_npz(z), seed=17)
    params = convert_word2vec_from_s3d(state)
    ids, mask = G.word2vec_inputs()
    out = word2vec_forward(params, jnp.asarray(ids), jnp.asarray(mask))
    for key in ("last_hidden_state", "pooler_output"):
        assert _rel(out[key], z[f"out::{key}"]) < 2e-5, key


def test_golden_word2vec_tokenizer():
    """Word2VecTokenizer (word2vec_model.py:26-73) against reference token
    ids: lowercasing, the [\\w']+ split, OOV->0, pad/truncate to max_words,
    and the nonzero attention mask."""
    from exoground_tpu.models.word2vec import Word2VecTokenizer

    z = np.load(os.path.join(G.GOLDEN_DIR, "word2vec.npz"))
    tok = Word2VecTokenizer(dict(G.GOLDEN_VOCAB), max_words=G.GOLDEN_MAX_WORDS)
    enc = tok(list(G.GOLDEN_SENTENCES))
    np.testing.assert_array_equal(enc["input_ids"], z["out::tok_input_ids"])
    np.testing.assert_array_equal(
        enc["attention_mask"], z["out::tok_attention_mask"]
    )


@pytest.mark.slow
def test_golden_s3d_trunk():
    """S3D-G trunk (s3dg.py:250-348) against the committed reference pooled
    features — covers convert_s3d_state_dict, space-to-depth + the [1:,1:,1:]
    crop, TF-SAME pools, SelfGating, and frozen-BN inference math."""
    import jax.numpy as jnp

    from exoground_tpu.models.s3d import S3D
    from exoground_tpu.utils.convert import convert_s3d_state_dict

    z = np.load(os.path.join(G.GOLDEN_DIR, "s3d.npz"))
    state = G.synth_state_bn(G.manifest_from_npz(z), seed=23)
    variables = convert_s3d_state_dict(state)
    model = S3D(num_classes=24)
    x = G.s3d_inputs()
    out = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),  # NCDHW -> NDHWC
            return_embedding=False,
        )
    )
    assert out.shape == z["out::pooled_trunk"].shape
    assert _rel(out, z["out::pooled_trunk"]) < 2e-3


def test_golden_align_protocol():
    """HTM-Align protocol (eval_zeroshot_align.py:96-252) against frozen
    reference metrics: overlap-seq windowing/stitching and global mode, with
    and without the alignability head, Recall + ROC-AUC — protocol drift in
    evals/align.py fails here without torch or the reference."""
    from exoground_tpu.evals.align import AlignEvalConfig, test_alignment_htm

    z = np.load(os.path.join(G.GOLDEN_DIR, "align_protocol.npz"))
    for use_head in (False, True):
        tag = "head" if use_head else "nohead"

        items, _ = G.align_protocol_items()
        cfg = AlignEvalConfig(
            sim_scale=1.0, use_alignability_head=use_head,
            window_chunk=5, text_bucket=4,
        )
        got = test_alignment_htm(items, G.align_our_sim_fn(use_head), cfg)
        np.testing.assert_allclose(
            got["Recall"], z[f"out::overlap_{tag}_recall"], atol=1e-9,
            err_msg=f"overlap {tag}")
        np.testing.assert_allclose(
            got["AUC"], z[f"out::overlap_{tag}_auc"], atol=1e-7,
            err_msg=f"overlap {tag}")

        g_items, _ = G.align_protocol_items(seed=1)
        gcfg = AlignEvalConfig(
            sim_scale=1.0, use_alignability_head=use_head, method="global",
            global_len_bucket=32,
        )
        gg = test_alignment_htm(g_items, G.align_our_sim_fn(use_head), gcfg)
        np.testing.assert_allclose(
            gg["Recall"], z[f"out::global_{tag}_recall"], atol=1e-9,
            err_msg=f"global {tag}")
        np.testing.assert_allclose(
            gg["AUC"], z[f"out::global_{tag}_auc"], atol=1e-7,
            err_msg=f"global {tag}")


def test_golden_yc2_protocol():
    """YouCook2 retrieval protocol (eval_zeroshot_retrieval.py:156-256)
    against frozen reference metrics: clip trimming, norm-then-mean pooling,
    interpolate_from gating, raw/centered/standardized R1/R5/R10/MR."""
    z = np.load(os.path.join(G.GOLDEN_DIR, "retrieval_protocol.npz"))
    items, _table, w_vis, w_txt = G.yc2_protocol_items()
    got = G.yc2_run_ours(items, w_vis, w_txt)
    for k in G.YC2_METRIC_KEYS:
        np.testing.assert_allclose(
            got[k], z[f"out::{k}"], atol=1e-9, err_msg=k
        )

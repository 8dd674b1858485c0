"""Checkpoint converter tests: torch key layouts -> flax param trees.

Synthetic torch state dicts are built with the reference's key names/shapes
(SURVEY.md §2.2-2.4); conversion must produce trees structurally identical to
model.init outputs, and transposes must round-trip values correctly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from exoground_tpu.models import (
    ExoGroundingTransformer,
    TemporalAligner,
    ViewInvariantMLP,
)
from exoground_tpu.models.word2vec import word2vec_forward
from exoground_tpu.utils.convert import (
    convert_exoground_state_dict,
    convert_tan_state_dict,
    convert_vi_mlp_state_dict,
    convert_word2vec_from_s3d,
)


def _rng_tensor(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def _torch_encoder_keys(rng, prefix, layers, c):
    sd = {}
    for i in range(layers):
        k = f"{prefix}.resblocks.{i}"
        sd[f"{k}.attn.in_proj_weight"] = _rng_tensor(rng, 3 * c, c)
        sd[f"{k}.attn.in_proj_bias"] = _rng_tensor(rng, 3 * c)
        sd[f"{k}.attn.out_proj.weight"] = _rng_tensor(rng, c, c)
        sd[f"{k}.attn.out_proj.bias"] = _rng_tensor(rng, c)
        sd[f"{k}.ln_1.weight"] = _rng_tensor(rng, c)
        sd[f"{k}.ln_1.bias"] = _rng_tensor(rng, c)
        sd[f"{k}.ln_2.weight"] = _rng_tensor(rng, c)
        sd[f"{k}.ln_2.bias"] = _rng_tensor(rng, c)
        sd[f"{k}.mlp.c_fc.weight"] = _rng_tensor(rng, 4 * c, c)
        sd[f"{k}.mlp.c_fc.bias"] = _rng_tensor(rng, 4 * c)
        sd[f"{k}.mlp.c_proj.weight"] = _rng_tensor(rng, c, 4 * c)
        sd[f"{k}.mlp.c_proj.bias"] = _rng_tensor(rng, c)
    return sd


def _torch_decoder_keys(rng, prefix, layers, c):
    sd = {}
    for i in range(layers):
        k = f"{prefix}.resblocks.{i}"
        for attn in ("self_attn", "attn"):
            sd[f"{k}.{attn}.in_proj_weight"] = _rng_tensor(rng, 3 * c, c)
            sd[f"{k}.{attn}.in_proj_bias"] = _rng_tensor(rng, 3 * c)
            sd[f"{k}.{attn}.out_proj.weight"] = _rng_tensor(rng, c, c)
            sd[f"{k}.{attn}.out_proj.bias"] = _rng_tensor(rng, c)
        for ln in ("ln_1", "ln_2", "ln_3"):
            sd[f"{k}.{ln}.weight"] = _rng_tensor(rng, c)
            sd[f"{k}.{ln}.bias"] = _rng_tensor(rng, c)
        sd[f"{k}.mlp.c_fc.weight"] = _rng_tensor(rng, 4 * c, c)
        sd[f"{k}.mlp.c_fc.bias"] = _rng_tensor(rng, 4 * c)
        sd[f"{k}.mlp.c_proj.weight"] = _rng_tensor(rng, c, 4 * c)
        sd[f"{k}.mlp.c_proj.bias"] = _rng_tensor(rng, c)
    return sd


def _ln_keys(rng, name, c):
    return {f"{name}.weight": _rng_tensor(rng, c), f"{name}.bias": _rng_tensor(rng, c)}


def _assert_same_structure(converted, reference_params):
    conv_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    ref_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(reference_params)[0]
    }
    assert conv_paths == ref_paths, (
        f"missing: {set(ref_paths) - set(conv_paths)}, "
        f"extra: {set(conv_paths) - set(ref_paths)}, "
        f"shape diffs: { {k: (conv_paths.get(k), ref_paths.get(k)) for k in conv_paths if k in ref_paths and conv_paths[k] != ref_paths[k]} }"
    )


class TestTANConverter:
    def test_structure_and_values(self):
        c, dv = 32, 48
        rng = np.random.RandomState(0)
        sd = {}
        sd.update(_torch_encoder_keys(rng, "video_temporal_encoder", 2, c))
        sd.update(_torch_encoder_keys(rng, "joint_temporal_encoder", 2, c))
        sd["video_pre_proj.weight"] = _rng_tensor(rng, c, dv)
        sd["text_pre_proj.weight"] = _rng_tensor(rng, c, dv)
        for name in ("ln_text_init", "ln_video_init", "ln_position_init",
                     "ln_video_post_enc", "ln_joint_post_enc"):
            sd.update(_ln_keys(rng, name, c))
        sd["temporal_pos_embed"] = _rng_tensor(rng, 64, c)
        sd["text_temporal_pos_embed"] = _rng_tensor(rng, 64, c)
        sd["mlp.weight"] = _rng_tensor(rng, c, c)
        sd["mlp.bias"] = _rng_tensor(rng, c)
        sd["binary_head.weight"] = _rng_tensor(rng, 1, c)
        sd["binary_head.bias"] = _rng_tensor(rng, 1)

        params = convert_tan_state_dict(sd)

        model = TemporalAligner(
            num_encoder_layers=2, num_joint_layers=2, width=c, heads=4,
            max_pos=64, use_alignability_head=1, attn_impl="xla",
        )
        video = jnp.zeros((1, 6, dv))
        text = jnp.zeros((1, 2, dv))
        ref = model.init(jax.random.PRNGKey(0), video, text,
                         jnp.zeros((1, 6), bool), jnp.zeros((1, 2), bool))["params"]
        _assert_same_structure(params, ref)

        # value spot-checks: transposes round-trip
        np.testing.assert_array_equal(
            params["video_pre_proj"]["kernel"], sd["video_pre_proj.weight"].T
        )
        np.testing.assert_array_equal(
            params["video_temporal_encoder"]["resblocks_0"]["attn"]["in_proj_kernel"],
            sd["video_temporal_encoder.resblocks.0.attn.in_proj_weight"].T,
        )
        # converted params run through the model
        out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                          jnp.asarray(np.random.randn(1, 6, dv).astype(np.float32)),
                          jnp.asarray(np.random.randn(1, 2, dv).astype(np.float32)),
                          jnp.zeros((1, 6), bool), jnp.zeros((1, 2), bool))
        assert np.all(np.isfinite(np.asarray(out["logits_dual"])))

    def test_twin_and_ddp_prefixes(self):
        c, dv = 16, 16
        rng = np.random.RandomState(1)
        base = {}
        base.update(_torch_encoder_keys(rng, "video_temporal_encoder", 1, c))
        base.update(_torch_encoder_keys(rng, "joint_temporal_encoder", 1, c))
        base["video_pre_proj.weight"] = _rng_tensor(rng, c, dv)
        base["text_pre_proj.weight"] = _rng_tensor(rng, c, dv)
        for name in ("ln_text_init", "ln_video_init", "ln_position_init",
                     "ln_video_post_enc", "ln_joint_post_enc"):
            base.update(_ln_keys(rng, name, c))
        base["temporal_pos_embed"] = _rng_tensor(rng, 8, c)
        base["text_temporal_pos_embed"] = _rng_tensor(rng, 8, c)
        base["mlp.weight"] = _rng_tensor(rng, c, c)
        base["mlp.bias"] = _rng_tensor(rng, c)

        twin = {}
        for k, v in base.items():
            twin[f"module.online.{k}"] = v
            twin[f"module.target.{k}"] = v * 2.0
        online = convert_tan_state_dict(twin, twin_branch="online")
        target = convert_tan_state_dict(twin, twin_branch="target")
        np.testing.assert_array_equal(
            online["temporal_pos_embed"], base["temporal_pos_embed"]
        )
        np.testing.assert_array_equal(
            target["temporal_pos_embed"], base["temporal_pos_embed"] * 2.0
        )


class TestExoGroundConverter:
    def test_structure(self):
        c, dv = 32, 40
        rng = np.random.RandomState(2)
        sd = {}
        for enc in ("multi_modal_encoder", "video_unimodal_encoder", "text_unimodal_encoder"):
            sd.update(_torch_encoder_keys(rng, enc, 2, c))
        sd.update(_torch_decoder_keys(rng, "decoder", 2, c))
        sd["grounding_head.weight"] = _rng_tensor(rng, 2, c)
        sd["grounding_head.bias"] = _rng_tensor(rng, 2)
        sd["video_pre_proj.weight"] = _rng_tensor(rng, c, dv)
        sd["text_pre_proj.weight"] = _rng_tensor(rng, c, dv)
        for name in ("ln_text_init", "ln_video_init", "ln_position_init",
                     "ln_joint_post_enc", "ln_video_post_enc", "ln_text_post_enc"):
            sd.update(_ln_keys(rng, name, c))
        sd["temporal_pos_embed"] = _rng_tensor(rng, 32, c)
        sd["text_temporal_pos_embed"] = _rng_tensor(rng, dv, c)
        sd["mlp.weight"] = _rng_tensor(rng, c, c)
        sd["mlp.bias"] = _rng_tensor(rng, c)
        sd["exo_feature_proj.weight"] = _rng_tensor(rng, dv, c)
        sd["exo_feature_proj.bias"] = _rng_tensor(rng, dv)

        params = convert_exoground_state_dict(sd)
        model = ExoGroundingTransformer(
            num_encoder_layers=2, num_decoder_layers=2,
            video_embed_dim=dv, text_embed_dim=dv, feature_dim=c, heads=4,
            max_pos=32, use_distill_nce_loss=True, attn_impl="xla",
        )
        video = jnp.zeros((1, 6, dv))
        text = jnp.zeros((1, 2, dv))
        ref = model.init(
            jax.random.PRNGKey(0), video, text,
            jnp.zeros((1, 6), bool), jnp.zeros((1, 2), bool),
            egocentric_video_embed=video,
        )["params"]
        _assert_same_structure(params, ref)


class TestVIMLPAndWord2Vec:
    def test_vi_mlp(self):
        d = 24
        rng = np.random.RandomState(3)
        sd = {
            "video_pre_proj.weight": _rng_tensor(rng, d, d),
            "ln_video_init.weight": _rng_tensor(rng, d),
            "ln_video_init.bias": _rng_tensor(rng, d),
            "mlp.0.weight": _rng_tensor(rng, d, d),
            "mlp.0.bias": _rng_tensor(rng, d),
            "mlp.2.weight": _rng_tensor(rng, d, d),
            "mlp.2.bias": _rng_tensor(rng, d),
        }
        params = convert_vi_mlp_state_dict(sd)
        model = ViewInvariantMLP(video_embed_dim=d)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, d)))["params"]
        _assert_same_structure(params, ref)
        out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                          jnp.asarray(_rng_tensor(rng, 1, 4, d)))
        assert out["high_dim_features"].shape == (1, 4, d)

    def test_word2vec(self):
        rng = np.random.RandomState(4)
        sd = {
            "text_module.word_embd.weight": _rng_tensor(rng, 10, 6),
            "text_module.fc1.weight": _rng_tensor(rng, 12, 6),
            "text_module.fc1.bias": _rng_tensor(rng, 12),
            "text_module.fc2.weight": _rng_tensor(rng, 5, 12),
            "text_module.fc2.bias": _rng_tensor(rng, 5),
        }
        params = convert_word2vec_from_s3d(sd)
        out = word2vec_forward(
            jax.tree_util.tree_map(jnp.asarray, params),
            jnp.asarray([[1, 2, 0, 0]]),
            jnp.asarray([[1, 1, 0, 0]]),
        )
        assert out["pooler_output"].shape == (1, 5)
        # numerically verify against torch-free manual computation
        x = sd["text_module.word_embd.weight"][[1, 2]]
        h = np.maximum(x @ sd["text_module.fc1.weight"].T + sd["text_module.fc1.bias"], 0)
        pooled = h.max(0) @ sd["text_module.fc2.weight"].T + sd["text_module.fc2.bias"]
        np.testing.assert_allclose(np.asarray(out["pooler_output"])[0], pooled, rtol=1e-5)

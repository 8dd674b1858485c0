"""Model-level tests: shapes, pos-start randomness, EMA, logit structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exoground_tpu.models import (
    ExoGroundingTransformer,
    GroundingModel,
    TemporalAligner,
    ViewInvariantMLP,
    Word2VecTokenizer,
    ema_init,
    ema_update,
)
from exoground_tpu.models.word2vec import word2vec_forward


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def _tiny_aligner(**kw):
    defaults = dict(
        num_encoder_layers=2, num_joint_layers=2, input_dim=64,
        width=32, heads=4, max_pos=64, attn_impl="xla",
    )
    defaults.update(kw)
    return TemporalAligner(**defaults)


class TestTemporalAligner:
    def setup_method(self):
        self.B, self.T, self.N, self.D = 2, 12, 3, 64
        self.video = jnp.asarray(_rand(self.B, self.T, self.D, seed=1))
        self.text = jnp.asarray(_rand(self.B, self.N, self.D, seed=2))
        self.vmask = jnp.zeros((self.B, self.T), bool)
        self.lmask = jnp.asarray(np.array([[0, 0, 1], [0, 0, 0]], bool))

    @pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
    def test_forward_shapes(self):
        m = _tiny_aligner(use_alignability_head=1)
        p = m.init(jax.random.PRNGKey(0), self.video, self.text, self.vmask, self.lmask)
        out = m.apply(p, self.video, self.text, self.vmask, self.lmask)
        assert out["logits_dual"].shape == (self.B, 2, self.T, self.B, self.N)
        assert out["logits_joint"].shape == (self.B, 2, self.T, self.B, self.N)
        assert out["dual_logits_alignability"].shape == (self.B, self.N, 1)
        assert out["joint_logits_alignability"].shape == (self.B, 2, self.N, 1)

    def test_dual_logits_are_cosine(self):
        """logits_dual[a,s,t,b,k] = <norm video feat, norm text feat> in [-1,1]."""
        m = _tiny_aligner()
        p = m.init(jax.random.PRNGKey(0), self.video, self.text, self.vmask, self.lmask)
        out = m.apply(p, self.video, self.text, self.vmask, self.lmask)
        ld = np.asarray(out["logits_dual"])
        assert np.all(ld <= 1.0 + 1e-5) and np.all(ld >= -1.0 - 1e-5)
        # consistency with returned normalized features
        rebuilt = np.einsum(
            "astc,bkc->astbk",
            np.asarray(out["dual_feature_video"]),
            np.asarray(out["dual_feature_text"]),
        )
        np.testing.assert_allclose(ld, rebuilt, atol=1e-5)

    def test_random_pos_start_changes_output_only_when_stochastic(self):
        m = _tiny_aligner(random_pos_start=1)
        p = m.init(
            {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
            self.video, self.text, self.vmask, self.lmask, deterministic=False,
        )
        det1 = m.apply(p, self.video, self.text, self.vmask, self.lmask)
        det2 = m.apply(p, self.video, self.text, self.vmask, self.lmask)
        np.testing.assert_array_equal(
            np.asarray(det1["logits_dual"]), np.asarray(det2["logits_dual"])
        )
        r1 = m.apply(p, self.video, self.text, self.vmask, self.lmask,
                     deterministic=False, rngs={"pos": jax.random.PRNGKey(7)})
        r2 = m.apply(p, self.video, self.text, self.vmask, self.lmask,
                     deterministic=False, rngs={"pos": jax.random.PRNGKey(8)})
        assert not np.allclose(np.asarray(r1["logits_dual"]), np.asarray(r2["logits_dual"]))

    @pytest.mark.slow  # compile-heavy: integration tier (fast gate stays <3 min)
    def test_interpolate_from_global_mode(self):
        """Longer-than-train video via pos-emb interpolation (tan_model.py:151-154)."""
        m = _tiny_aligner()
        p = m.init(jax.random.PRNGKey(0), self.video, self.text, self.vmask, self.lmask)
        long_video = jnp.asarray(_rand(1, 40, self.D, seed=9))
        sim = m.apply(
            p, long_video, self.text[:1], interpolate_from=12,
            method=TemporalAligner.text_visual_sim,
        )
        assert sim["sim"].shape == (1, 2, 40, self.N)
        assert sim["dual-sim"].shape == (1, 2, 40, self.N)

    def test_ema_twin(self):
        m = _tiny_aligner()
        p = m.init(jax.random.PRNGKey(0), self.video, self.text, self.vmask, self.lmask)
        online = p["params"]
        target = ema_init(online)
        # target forward == online forward at init
        o1 = m.apply({"params": online}, self.video, self.text, self.vmask, self.lmask)
        o2 = m.apply({"params": target}, self.video, self.text, self.vmask, self.lmask)
        np.testing.assert_array_equal(np.asarray(o1["logits_dual"]), np.asarray(o2["logits_dual"]))
        # ema update moves target towards online
        online2 = jax.tree_util.tree_map(lambda x: x + 1.0, online)
        t2 = ema_update(target, online2, m=0.9)
        leaf_old = jax.tree_util.tree_leaves(target)[0]
        leaf_new = jax.tree_util.tree_leaves(t2)[0]
        np.testing.assert_allclose(
            np.asarray(leaf_new), np.asarray(leaf_old) * 0.9 + (np.asarray(leaf_old) + 1.0) * 0.1,
            rtol=1e-6,
        )


class TestGroundingModels:
    @pytest.mark.slow  # compile-heavy: integration tier (fast gate stays <3 min)
    def test_exo_grounding_shapes_with_audio(self):
        B, T, N = 2, 10, 3
        video = jnp.asarray(_rand(B, T, 64, seed=1))
        text = jnp.asarray(_rand(B, N, 64, seed=2))
        audio = jnp.asarray(_rand(B, T, 48, seed=3))
        vmask = jnp.zeros((B, T), bool)
        lmask = jnp.zeros((B, N), bool)
        amask = jnp.zeros((B, T), bool)
        m = ExoGroundingTransformer(
            num_encoder_layers=2, num_decoder_layers=2, use_audio=True,
            video_embed_dim=64, text_embed_dim=64, audio_embed_dim=48,
            feature_dim=32, heads=4, max_pos=32, attn_impl="xla",
        )
        p = m.init(jax.random.PRNGKey(0), video, text, vmask, lmask, audio, amask)
        out = m.apply(p, video, text, vmask, lmask, audio, amask)
        assert out["interval_preds"].shape == (B, N, 2)
        assert out["low_dim_features"].shape == (B, T, 32)

    @pytest.mark.slow  # compile-heavy: integration tier (fast gate stays <3 min)
    def test_no_decoder_path(self):
        B, T, N = 2, 8, 3
        video = jnp.asarray(_rand(B, T, 64, seed=4))
        text = jnp.asarray(_rand(B, N, 64, seed=5))
        vmask = jnp.zeros((B, T), bool)
        lmask = jnp.zeros((B, N), bool)
        m = ExoGroundingTransformer(
            use_decoder=False, video_embed_dim=64, text_embed_dim=64,
            feature_dim=32, heads=4, max_pos=32, attn_impl="xla",
        )
        p = m.init(jax.random.PRNGKey(0), video, text, vmask, lmask)
        out = m.apply(p, video, text, vmask, lmask)
        # encoder-head path emits per-stage predictions (B, Stage, N, 2)
        assert out["interval_preds"].shape == (B, 2, N, 2)

    @pytest.mark.slow  # compile-heavy: integration tier (fast gate stays <3 min)
    def test_grounding_model_vi_frozen(self):
        """VI encoder output is stop_gradient'ed: grads wrt vi params are zero."""
        B, T, N = 2, 8, 3
        video = jnp.asarray(_rand(B, T, 64, seed=6))
        text = jnp.asarray(_rand(B, N, 64, seed=7))
        vmask = jnp.zeros((B, T), bool)
        lmask = jnp.zeros((B, N), bool)
        m = GroundingModel(
            vi_encoder_type="mlp", video_embed_dim=64, text_embed_dim=64,
            feature_dim=32, attn_impl="xla",
        )
        p = m.init(jax.random.PRNGKey(0), video, text, vmask, lmask)

        def loss_fn(params):
            out = m.apply({"params": params}, video, text, vmask, lmask)
            return jnp.sum(out["interval_preds"] ** 2)

        g = jax.grad(loss_fn)(p["params"])
        vi_grads = jax.tree_util.tree_leaves(g["vi_encoder"])
        assert all(float(jnp.abs(x).max()) == 0.0 for x in vi_grads)
        trunk_grads = jax.tree_util.tree_leaves(g["trunk"])
        assert any(float(jnp.abs(x).max()) > 0.0 for x in trunk_grads)

    @pytest.mark.slow  # compile-heavy: integration tier (r5 re-tier)
    def test_grounding_model_vi_config_forwarded(self):
        """The transformer VI pre-pass inherits the trunk's pos-enc config
        (reference main_egoexo4d_distributed.py:628-644 passes the same args
        namespace to both models): with pos_enc='sine' the VI encoder must
        not create a learned pos table, and multi-view stitched inputs must
        tile the VI pos table per view like the trunk."""
        B, T, N, V = 2, 8, 3, 2
        video = jnp.asarray(_rand(B, V * T, 64, seed=8))
        text = jnp.asarray(_rand(B, N, 64, seed=9))
        vmask = jnp.zeros((B, V * T), bool)
        lmask = jnp.zeros((B, N), bool)
        m = GroundingModel(
            vi_encoder_type="transformer", pos_enc="sine", random_pos_start=0,
            multi_view=True, num_max_views=V, num_encoder_layers=1,
            num_decoder_layers=1, video_embed_dim=64, text_embed_dim=64,
            feature_dim=32, attn_impl="xla",
        )
        p = m.init(jax.random.PRNGKey(0), video, text, vmask, lmask)
        flat = {
            "/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(p["params"])[0]
        }
        assert not any(
            "vi_encoder" in k and "temporal_pos_embed" in k for k in flat
        ), "sine pos-enc must not allocate a learned table in the VI encoder"
        out = m.apply(p, video, text, vmask, lmask)
        assert out["interval_preds"].shape[0] == B


class TestWord2Vec:
    def test_tokenizer_and_model(self):
        vocab = {"hello": 1, "world": 2, "cook": 3, "the": 4, "pasta": 5}
        tok = Word2VecTokenizer(vocab, max_words=6)
        out = tok(["Hello, world!", "cook the pasta now"])
        np.testing.assert_array_equal(out["input_ids"][0], [1, 2, 0, 0, 0, 0])
        np.testing.assert_array_equal(out["input_ids"][1], [3, 4, 5, 0, 0, 0])
        np.testing.assert_array_equal(out["attention_mask"][0], [1, 1, 0, 0, 0, 0])

        rng = np.random.RandomState(0)
        params = {
            "word_embd": jnp.asarray(rng.randn(6, 8).astype(np.float32)),
            "fc1": {"kernel": jnp.asarray(rng.randn(8, 16).astype(np.float32)),
                    "bias": jnp.zeros(16)},
            "fc2": {"kernel": jnp.asarray(rng.randn(16, 4).astype(np.float32)),
                    "bias": jnp.zeros(4)},
        }
        res = word2vec_forward(params, jnp.asarray(out["input_ids"]),
                               jnp.asarray(out["attention_mask"]))
        assert res["last_hidden_state"].shape == (2, 6, 4)
        assert res["pooler_output"].shape == (2, 4)

        # masked max-pool must ignore pad positions: recompute manually
        x = np.asarray(params["word_embd"])[np.asarray(out["input_ids"])]
        h = np.maximum(x @ np.asarray(params["fc1"]["kernel"]), 0)
        m = np.asarray(out["attention_mask"]).astype(bool)
        pooled0 = h[0][m[0]].max(0) @ np.asarray(params["fc2"]["kernel"])
        np.testing.assert_allclose(np.asarray(res["pooler_output"])[0], pooled0, rtol=1e-5)

    def test_all_oov_sentence_pools_everything(self):
        vocab = {"hello": 1}
        tok = Word2VecTokenizer(vocab, max_words=4)
        out = tok(["zzz qqq"])  # all OOV -> all token 0 -> empty mask
        assert out["attention_mask"].sum() == 0
        params = {
            "word_embd": jnp.asarray(_rand(2, 4, seed=1)),
            "fc1": {"kernel": jnp.asarray(_rand(4, 8, seed=2)), "bias": jnp.zeros(8)},
            "fc2": {"kernel": jnp.asarray(_rand(8, 3, seed=3)), "bias": jnp.zeros(3)},
        }
        res = word2vec_forward(params, jnp.asarray(out["input_ids"]),
                               jnp.asarray(out["attention_mask"]))
        assert np.all(np.isfinite(np.asarray(res["pooler_output"])))

"""TemporalAligner — the TAN dual + joint encoder model.

Rebuild of reference model/tan_model.py:13-306 as a flax module in (B, T, C)
layout. Architecture: a video-only "dual" encoder and a video⊕text "joint"
encoder (both width 512 / 8 heads), 4096->512 pre-projections, learned or sine
temporal pos-embedding with random-start augmentation and linear interpolation
for longer-than-train sequences, optional text temporal pos-embedding, and an
optional binary alignability head.

forward returns the per-layer cross-batch similarity volumes the TAN MIL-NCE
loss consumes:
  logits_dual  = einsum('astc,bkc->astbk')   (tan_model.py:112)
  logits_joint = einsum('astc,bskc->astbk')  (tan_model.py:132)

Randomness (pos-embed random start, tan_model.py:156-160) comes from the
'pos' RNG collection: pass ``deterministic=False`` and
``rngs={'pos': key}`` to apply() during training; the EMA target and all
eval paths use ``deterministic=True`` (reference twin sets
``target.random_pos_start = 0``, tan_model.py:327).

Known reference bugs NOT replicated (SURVEY.md §7): ``TwinTemporalAligner``
references a nonexistent ``self.online.bert`` (tan_model.py:317); the EMA twin
here is a param-tree (models/ema.py) so the issue does not arise.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from exoground_tpu.ops.blocks import LN_EPS, TemporalEncoder
from exoground_tpu.ops.quant import dense_dot_general as _quant_dot_general
from exoground_tpu.ops.pos_embed import (
    get_position_embedding_sine,
    random_pos_start,
    slice_or_interpolate_pos_embed,
)


def _l2norm(x: jnp.ndarray) -> jnp.ndarray:
    # eps guards all-pad rows (exactly-zero embeddings) from 0/0 -> NaN
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


class TemporalAligner(nn.Module):
    num_encoder_layers: int = 6
    num_joint_layers: int = 6  # "num_decoder_layers" in the reference CLI
    sim: str = "cos"
    pos_enc: str = "learned"  # 'learned' | 'sine'
    use_text_pos_enc: int = 0
    return_dual_feature: int = 1
    random_pos_start: int = 1
    use_alignability_head: int = 0
    width: int = 512
    heads: int = 8
    input_dim: int = 4096  # S3D/feature dimension of video & text inputs
    max_pos: int = 4096  # pos table length (tan_model.py:52)
    attn_impl: Optional[str] = None  # None = auto dispatch
    mlp_impl: Optional[str] = None  # None = auto; 'fused' = VMEM kernel (ops/fused_mlp.py)

    def setup(self):
        w = self.width
        self.video_temporal_encoder = TemporalEncoder(w, self.num_encoder_layers, self.heads)
        self.joint_temporal_encoder = TemporalEncoder(w, self.num_joint_layers, self.heads)
        dense_init = nn.initializers.normal(0.01)
        self.video_pre_proj = nn.Dense(
            w, use_bias=False, kernel_init=dense_init,
            dot_general=_quant_dot_general,
        )
        self.text_pre_proj = nn.Dense(
            w, use_bias=False, kernel_init=dense_init,
            dot_general=_quant_dot_general,
        )
        self.ln_text_init = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_video_init = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_position_init = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_video_post_enc = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_joint_post_enc = nn.LayerNorm(epsilon=LN_EPS)
        if self.pos_enc == "learned":
            self.temporal_pos_embed = self.param(
                "temporal_pos_embed", nn.initializers.normal(0.01), (self.max_pos, w)
            )
        else:
            self.temporal_pos_embed = get_position_embedding_sine(w, self.max_pos)
        self.text_temporal_pos_embed = self.param(
            "text_temporal_pos_embed", nn.initializers.normal(0.01), (self.max_pos, w)
        )
        if self.use_alignability_head:
            self.binary_head = nn.Dense(
                1, kernel_init=nn.initializers.normal(0.01), bias_init=nn.initializers.zeros
            )

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _pos_slice(self, table, seq_len, interpolate_from, deterministic,
                   true_len=None):
        start = 0
        if interpolate_from is None and self.random_pos_start and not deterministic:
            start = random_pos_start(self.make_rng("pos"), seq_len)
        return slice_or_interpolate_pos_embed(
            table, seq_len, interpolate_from, start, true_len=true_len
        )

    def _video_with_time(self, video_embed, interpolate_from, deterministic,
                         pos_interp_len=None, preprojected=False):
        if preprojected:
            # serving fast path: the caller already ran preproject_video on
            # the full corpus (once, at index time); only the
            # position-DEPENDENT part remains per window
            x = video_embed
        else:
            x = self.ln_video_init(self.video_pre_proj(video_embed))
        t = x.shape[1]
        pos = self._pos_slice(
            self.temporal_pos_embed, t, interpolate_from, deterministic,
            true_len=pos_interp_len,
        )
        return x + self.ln_position_init(pos)[None]

    def preproject_video(self, video_embed):
        """Position-independent half of the video input stage:
        ``ln_video_init(video_pre_proj(x))``, i.e. everything in
        `_video_with_time` before the positional add.

        Serving (index-time vs query-time split): the overlap-seq stitcher
        re-runs the (4096 -> width) pre-projection on every frame of every
        64-frame window — 4x window overlap x 2 towers (dual + joint both
        call `_video_with_time`) = 8 projections per corpus frame per sweep.
        Both are per-frame maps, so a resident corpus can be projected ONCE
        at preload (evals/align_fused.py AlignEvalConfig.preproject) and the
        per-sweep programs gather width-d rows and skip straight to the
        positional add. The reference recomputes per window by construction
        (tan_model.py:148-156 inside the per-chunk eval loop)."""
        return self.ln_video_init(self.video_pre_proj(video_embed))

    def preproject_text(self, lang_embed):
        """Position-independent text input stage == get_textual_feature
        (``ln_text_init(text_pre_proj(x))``); alias named for the serving
        split. The stitcher projects each text once per WINDOW SLOT it is
        active in (~20-30 windows per text), twice per window (raw + with-
        time); preprojecting the corpus text table pays it once per text."""
        return self.get_textual_feature(lang_embed)

    # ------------------------------------------------------------------
    # feature extractors (reference tan_model.py:146-228)
    # ------------------------------------------------------------------

    def get_visual_feature(
        self, video_embed, video_padding_mask, interpolate_from=None,
        deterministic=True, pos_interp_len=None, preprojected=False,
    ):
        """Dual-encoder video tower -> per-stage features (B, Stage, T, C).

        ``preprojected=True``: ``video_embed`` already went through
        ``preproject_video`` (the resident-corpus serving split)."""
        x = self._video_with_time(
            video_embed, interpolate_from, deterministic, pos_interp_len,
            preprojected=preprojected,
        )
        if self.num_encoder_layers == 0:
            return x[:, None]  # (B, 1, T, C); degenerate config used by baselines
        stages = self.video_temporal_encoder(
            x, video_padding_mask, impl=self.attn_impl,
            mlp_impl=self.mlp_impl,
        )
        stages = stages.at[:, -1].set(self.ln_video_post_enc(stages[:, -1]))
        return stages

    def get_textual_feature(self, lang_embed):
        return self.ln_text_init(self.text_pre_proj(lang_embed))

    def get_textual_feature_with_time(
        self, lang_embed, interpolate_from=None, deterministic=True,
        preprojected=False,
    ):
        """Text features + temporal pos-emb (tan_model.py:206-222)."""
        x = lang_embed if preprojected else self.get_textual_feature(lang_embed)
        n = x.shape[1]
        pos = self._pos_slice(self.text_temporal_pos_embed, n, interpolate_from, deterministic)
        return x + self.ln_position_init(pos)[None]

    def get_joint_feature(
        self,
        video_embed,
        video_padding_mask,
        lang_embed_with_time,
        lang_padding_mask,
        interpolate_from=None,
        deterministic=True,
        pos_interp_len=None,
        preprojected=False,
    ):
        """Joint encoder over [video ⊕ text]; returns (video, text) stage stacks.

        Note: like the reference (tan_model.py:181-192), the joint pass draws
        its own (independent) random pos start.
        """
        x = self._video_with_time(
            video_embed, interpolate_from, deterministic, pos_interp_len,
            preprojected=preprojected,
        )
        t = x.shape[1]
        joint = jnp.concatenate([x, lang_embed_with_time], axis=1)
        joint_mask = jnp.concatenate([video_padding_mask, lang_padding_mask], axis=1)
        stages = self.joint_temporal_encoder(
            joint, joint_mask, impl=self.attn_impl,
            mlp_impl=self.mlp_impl,
        )
        stages = stages.at[:, -1].set(self.ln_joint_post_enc(stages[:, -1]))
        return stages[:, :, :t], stages[:, :, t:]

    # ------------------------------------------------------------------
    # training forward (tan_model.py:94-143)
    # ------------------------------------------------------------------

    def __call__(
        self,
        video_embed,  # (B, T, 4096)
        lang_embed,  # (B, N, 4096)
        video_padding_mask,  # (B, T) True=PAD
        lang_padding_mask,  # (B, N) True=PAD
        text_timestamp=None,  # unused (parity with reference signature)
        interpolate_from: Optional[int] = None,
        deterministic: bool = True,
        return_sim_volumes: bool = True,
    ):
        """``return_sim_volumes=False`` skips the cross-batch einsums
        (tan_model.py:112,132) and returns only the normalized features —
        the fused-grid train path (losses/milnce.py::_feature_two_way)
        streams the similarity grid blockwise and never materializes the
        (B,S,T,B,N) volumes."""
        video_out = self.get_visual_feature(
            video_embed, video_padding_mask, interpolate_from, deterministic
        )
        lang_raw = self.get_textual_feature(lang_embed)

        video_n = _l2norm(video_out)
        text_n = _l2norm(lang_raw)

        if self.use_text_pos_enc:
            lang_with_time = self.get_textual_feature_with_time(
                lang_embed, interpolate_from, deterministic
            )
        else:
            lang_with_time = lang_raw

        joint_video, joint_text = self.get_joint_feature(
            video_embed, video_padding_mask, lang_with_time, lang_padding_mask,
            interpolate_from, deterministic,
        )
        video_nj = _l2norm(joint_video)
        text_nj = _l2norm(joint_text)

        out = {}
        if return_sim_volumes:
            out["logits_dual"] = jnp.einsum("astc,bkc->astbk", video_n, text_n)
            out["logits_joint"] = jnp.einsum("astc,bskc->astbk", video_nj, text_nj)
        if self.return_dual_feature or not return_sim_volumes:
            out["dual_feature_video"] = video_n
            out["dual_feature_text"] = text_n
            # normalized joint features: lets the data-parallel train step
            # all_gather text features and widen the contrastive grids
            out["joint_feature_video"] = video_nj
            out["joint_feature_text"] = text_nj
        if self.use_alignability_head:
            out["dual_logits_alignability"] = self.binary_head(lang_raw)
            out["joint_logits_alignability"] = self.binary_head(joint_text)
        return out

    # ------------------------------------------------------------------
    # inference entry points for HTM-Align eval (tan_model.py:231-306)
    # ------------------------------------------------------------------

    def text_visual_sim(
        self,
        video_embed,
        lang_embed,
        interpolate_from=None,
        video_padding_mask=None,
        lang_padding_mask=None,
        pos_interp_len=None,
        preprojected=False,
    ):
        """Per-video similarity dict used by the overlap-seq/global stitchers.

        ``preprojected=True``: both inputs already went through
        preproject_video / preproject_text (the resident-corpus serving
        split — evals/align_fused.py AlignEvalConfig.preproject); only the
        position-dependent adds + encoders run per window.

        ``pos_interp_len`` (traced scalar): when the video axis is a padded
        length bucket in global mode, the pos table interpolates to THIS real
        video length (not the bucket), so real frames get the reference's
        unpadded positional values.

        interpolate_from may be an int (video only) or (video, text) tuple.
        Optional padding masks allow the TPU-first *batched-window* eval:
        several stitcher windows run as one batch with tail frames / inactive
        texts masked out — key-padding removes them as attention keys, so the
        result on real entries is bit-identical to per-window calls
        (reference runs one unpadded window at a time,
        eval_zeroshot_align.py:179).
        Returns {'sim': (B,S,T,K) joint, 'dual-sim': (B,S,T,K) dual
                 [, 'alignability-dual'/'alignability-joint']}.
        """
        if isinstance(interpolate_from, (tuple, list)):
            video_if, text_if = interpolate_from
        else:
            video_if, text_if = interpolate_from, None

        b, t, _ = video_embed.shape
        n = lang_embed.shape[1]
        vmask = (
            jnp.zeros((b, t), dtype=bool)
            if video_padding_mask is None
            else video_padding_mask
        )
        lmask = (
            jnp.zeros((b, n), dtype=bool)
            if lang_padding_mask is None
            else lang_padding_mask
        )

        if self.use_text_pos_enc:
            lang_with_time = self.get_textual_feature_with_time(
                lang_embed, text_if, preprojected=preprojected
            )
        elif preprojected:
            lang_with_time = lang_embed
        else:
            lang_with_time = self.get_textual_feature(lang_embed)

        joint_video, joint_text = self.get_joint_feature(
            video_embed, vmask, lang_with_time, lmask, video_if,
            pos_interp_len=pos_interp_len, preprojected=preprojected,
        )
        sim_joint = jnp.einsum("bstc,bskc->bstk", _l2norm(joint_video), _l2norm(joint_text))

        video_out = self.get_visual_feature(
            video_embed, vmask, video_if, pos_interp_len=pos_interp_len,
            preprojected=preprojected,
        )
        lang_raw = (
            lang_embed if preprojected else self.get_textual_feature(lang_embed)
        )
        sim_dual = jnp.einsum("bstc,bkc->bstk", _l2norm(video_out), _l2norm(lang_raw))

        out = {"sim": sim_joint, "dual-sim": sim_dual}
        if self.use_alignability_head:
            out["alignability-dual"] = self.binary_head(lang_raw)
            out["alignability-joint"] = self.binary_head(joint_text)
        return out

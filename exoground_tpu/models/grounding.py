"""ExoGround keystep-grounding models.

``ExoGroundingTransformer`` rebuilds reference model/exo_ground_model.py:12-393:
uni-modal video + text encoders -> mean over collected per-layer stages ->
joint encoder over [video (, audio), text] -> TemporalDecoder with narrations
as queries and video as memory -> Linear grounding head emitting
(center, duration) or (start, end) per narration. Optional: audio branch
(2304->512), exo->ego 512->4096 projection for distillation, multi-view
stitched sequences with the pos table tiled per view.

``GroundingModel`` (reference model/keystep_ground_model.py:13-408) is the same
trunk with a frozen view-invariant encoder pre-pass over the video features
(stop_gradient stands in for torch.no_grad, keystep_ground_model.py:158-169)
and the distillation InfoNCE computed inside forward (:174-179,200-202).

Fixed (not replicated) reference bugs: the decoder memory mask ignores audio
length (exo_ground_model.py:172 would shape-error with use_audio); here the
memory mask concatenates video+audio masks. The pairwise multi-view InfoNCE's
4-D bmm crash is replaced by a masked static-shape formulation
(losses/infonce.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from exoground_tpu.losses.infonce import info_nce_diag, pairwise_view_info_nce
from exoground_tpu.models.vi_encoder import ViewInvariantEncoder, ViewInvariantMLP
from exoground_tpu.ops.blocks import (
    LN_EPS,
    TemporalDecoder,
    TemporalEncoder,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from exoground_tpu.ops.pos_embed import (
    get_position_embedding_sine,
    random_pos_start,
    slice_or_interpolate_pos_embed,
)
from exoground_tpu.ops.quant import dense_dot_general as _quant_dot_general


class ExoGroundingTransformer(nn.Module):
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    use_decoder: bool = True
    sim: str = "cos"
    pos_enc: str = "learned"
    use_text_pos_enc: int = 0
    random_pos_start: int = 1
    use_audio: bool = False
    video_embed_dim: int = 4096
    text_embed_dim: int = 4096
    audio_embed_dim: int = 2304
    feature_dim: int = 512
    use_distill_nce_loss: bool = False
    multi_view: bool = False
    num_max_views: int = 1
    use_pairwise_distill_nce_loss: bool = False
    pairwise_distill_mode: str = "all"
    heads: int = 8
    max_pos: int = 1024  # reference exo_ground_model.py:93
    attn_impl: Optional[str] = None

    def setup(self):
        w = self.feature_dim
        self.multi_modal_encoder = TemporalEncoder(w, self.num_encoder_layers, self.heads)
        if self.use_decoder:
            self.decoder = TemporalDecoder(w, self.num_decoder_layers, self.heads)
        self.video_unimodal_encoder = TemporalEncoder(w, self.num_encoder_layers, self.heads)
        self.text_unimodal_encoder = TemporalEncoder(w, self.num_encoder_layers, self.heads)

        init01 = nn.initializers.normal(0.01)
        # grounding_head stays exact under int8 serving: it's tiny (w -> 2)
        # and emits the actual regressed intervals
        self.grounding_head = nn.Dense(2, kernel_init=init01, bias_init=nn.initializers.zeros)
        # pre-projections route through the quant hook (== exact dot_general
        # outside an int8 serving context) — the 4096->512 input matmuls are
        # the model's biggest single dots
        self.video_pre_proj = nn.Dense(
            w, use_bias=False, kernel_init=init01,
            dot_general=_quant_dot_general,
        )
        self.text_pre_proj = nn.Dense(
            w, use_bias=False, kernel_init=init01,
            dot_general=_quant_dot_general,
        )
        self.ln_text_init = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_video_init = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_position_init = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_joint_post_enc = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_video_post_enc = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_text_post_enc = nn.LayerNorm(epsilon=LN_EPS)

        if self.use_distill_nce_loss or self.use_pairwise_distill_nce_loss:
            # NOT in the reference's re-init list (exo_ground_model.py:108-112):
            # keeps torch nn.Linear defaults
            self.exo_feature_proj = nn.Dense(
                self.video_embed_dim,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(w),
            )
        if self.use_audio:
            self.ln_audio_init = nn.LayerNorm(epsilon=LN_EPS)
            self.audio_pre_proj = nn.Dense(
                w, use_bias=False, kernel_init=init01,
                dot_general=_quant_dot_general,
            )

        if self.pos_enc == "learned":
            self.temporal_pos_embed = self.param(
                "temporal_pos_embed", nn.initializers.normal(0.01), (self.max_pos, w)
            )
        else:
            self.temporal_pos_embed = get_position_embedding_sine(w, self.max_pos)
        self.text_temporal_pos_embed = self.param(
            "text_temporal_pos_embed", nn.initializers.normal(0.01), (self.text_embed_dim, w)
        )

    # ------------------------------------------------------------------

    def _pos_embed_tiled(self, total_len, interpolate_from, deterministic):
        """Pos table slice of length total_len//num_max_views, tiled per view
        (reference exo_ground_model.py:294-310)."""
        seq_len = total_len // self.num_max_views
        start = 0
        if interpolate_from is None and self.random_pos_start and not deterministic:
            start = random_pos_start(self.make_rng("pos"), seq_len)
        pos = slice_or_interpolate_pos_embed(
            self.temporal_pos_embed, seq_len, interpolate_from, start
        )
        return jnp.tile(pos, (self.num_max_views, 1))

    def get_textual_feature(self, lang_embed):
        return self.ln_text_init(self.text_pre_proj(lang_embed))

    def get_textual_feature_with_time(self, lang_embed, interpolate_from=None, deterministic=True):
        x = self.get_textual_feature(lang_embed)
        n = x.shape[1]
        start = 0
        if interpolate_from is None and self.random_pos_start and not deterministic:
            start = random_pos_start(self.make_rng("pos"), n)
        pos = slice_or_interpolate_pos_embed(
            self.text_temporal_pos_embed, n, interpolate_from, start
        )
        return x + self.ln_position_init(pos)[None]

    def get_audio_feature(self, audio_embed):
        return self.ln_audio_init(self.audio_pre_proj(audio_embed))

    def get_unimodal_features(
        self, mode, feat_embed, padding_mask, interpolate_from=None, deterministic=True
    ):
        """Uni-modal encoder pass -> (B, Stage, X, C) (reference :294-321).

        For video: project + LN + tiled pos-emb. For text: features come in
        already projected (with or without text pos-emb)."""
        if mode == "video":
            x = self.ln_video_init(self.video_pre_proj(feat_embed))
            pos = self._pos_embed_tiled(x.shape[1], interpolate_from, deterministic)
            x = x + self.ln_position_init(pos)[None]
            stages = self.video_unimodal_encoder(x, padding_mask, impl=self.attn_impl)
            stages = stages.at[:, -1].set(self.ln_video_post_enc(stages[:, -1]))
        else:
            stages = self.text_unimodal_encoder(feat_embed, padding_mask, impl=self.attn_impl)
            stages = stages.at[:, -1].set(self.ln_text_post_enc(stages[:, -1]))
        return stages

    def get_joint_feature(
        self,
        video_feats,  # (B, T, C) already encoded (pos-emb inside uni-modal pass)
        video_padding_mask,
        text_feats,  # (B, N, C) already encoded
        lang_padding_mask,
        audio_feats=None,
        audio_padding_mask=None,
        interpolate_from=None,
        deterministic=True,
    ):
        """Joint encoder over [video (, audio), text] (reference :323-364).

        Only the audio branch receives a fresh pos-emb here; video pos-emb was
        added in the uni-modal pass (the reference re-computes but does not
        re-add it)."""
        if audio_feats is not None:
            pos = self._pos_embed_tiled(video_feats.shape[1], interpolate_from, deterministic)
            audio_with_time = audio_feats + self.ln_position_init(pos)[None]
            joint = jnp.concatenate([video_feats, audio_with_time, text_feats], axis=1)
            joint_mask = jnp.concatenate(
                [video_padding_mask, audio_padding_mask, lang_padding_mask], axis=1
            )
        else:
            joint = jnp.concatenate([video_feats, text_feats], axis=1)
            joint_mask = jnp.concatenate([video_padding_mask, lang_padding_mask], axis=1)
        stages = self.multi_modal_encoder(joint, joint_mask, impl=self.attn_impl)
        stages = stages.at[:, -1].set(self.ln_joint_post_enc(stages[:, -1]))
        return stages

    # ------------------------------------------------------------------

    def __call__(
        self,
        video_embed,  # (B, T[, *V stitched], D_video)
        lang_embed,  # (B, N, D_text)
        video_padding_mask,  # (B, T) True=PAD
        lang_padding_mask,  # (B, N) True=PAD
        audio_embed=None,
        audio_padding_mask=None,
        egocentric_video_embed=None,  # (B, T, D_video) distill target
        view_mask=None,  # (B, V) available views
        interpolate_from=None,
        deterministic: bool = True,
    ):
        n = lang_embed.shape[1]
        lang_raw = self.get_textual_feature(lang_embed)
        if self.use_text_pos_enc:
            lang_with_time = self.get_textual_feature_with_time(
                lang_embed, interpolate_from, deterministic
            )
        else:
            lang_with_time = lang_raw
        audio_feats = self.get_audio_feature(audio_embed) if audio_embed is not None else None

        video_feats = self.get_unimodal_features(
            "video", video_embed, video_padding_mask, interpolate_from, deterministic
        ).mean(axis=1)
        text_feats = self.get_unimodal_features(
            "text", lang_with_time, lang_padding_mask, interpolate_from, deterministic
        ).mean(axis=1)

        out = {"low_dim_features": video_feats}
        if (self.use_distill_nce_loss and egocentric_video_embed is not None) or (
            self.multi_view and self.use_pairwise_distill_nce_loss
        ):
            out["high_dim_features"] = self.exo_feature_proj(video_feats)

        all_stages = self.get_joint_feature(
            video_feats, video_padding_mask, text_feats, lang_padding_mask,
            audio_feats, audio_padding_mask, interpolate_from, deterministic,
        )
        decoder_context = all_stages[:, -1, :-n]  # last stage, video(+audio) part
        text_part = all_stages[:, :, -n:]

        if self.use_decoder:
            if audio_feats is not None:
                memory_mask = jnp.concatenate([video_padding_mask, audio_padding_mask], axis=1)
            else:
                memory_mask = video_padding_mask
            dec_stages = self.decoder(
                text_part[:, -1],
                decoder_context,
                tgt_key_padding_mask=lang_padding_mask,
                memory_key_padding_mask=memory_mask,
                impl=self.attn_impl,
            )
            grounding = self.grounding_head(dec_stages[:, -1])  # (B, N, 2)
        else:
            grounding = self.grounding_head(text_part)  # (B, Stage, N, 2)

        out["interval_preds"] = grounding
        return out

    def get_low_dim_target_features(self, video_embed, video_padding_mask, deterministic=True):
        """EMA-target helper (reference exo_ground_model.py:185-188)."""
        feats = self.get_unimodal_features(
            "video", video_embed, video_padding_mask, deterministic=deterministic
        ).mean(axis=1)
        return {"low_dim_features": feats}


class GroundingModel(nn.Module):
    """Grounding trunk + frozen view-invariant encoder pre-pass.

    Reference model/keystep_ground_model.py:13-408. The VI encoder runs under
    stop_gradient (≡ torch.no_grad, :158-169); its high-dim output replaces
    the raw video features fed to the trunk. The distillation InfoNCE is
    computed inside forward and returned in the output dict (:174-179,200-202).
    """

    vi_encoder_type: str = "mlp"  # 'mlp' | 'transformer' | 'none'
    num_encoder_layers: int = 2
    num_decoder_layers: int = 2
    use_decoder: bool = True
    pos_enc: str = "learned"
    use_text_pos_enc: int = 0
    random_pos_start: int = 1
    use_audio: bool = False
    video_embed_dim: int = 4096
    text_embed_dim: int = 4096
    audio_embed_dim: int = 2304
    feature_dim: int = 512
    use_distill_nce_loss: bool = False
    multi_view: bool = False
    num_max_views: int = 1
    use_pairwise_distill_nce_loss: bool = False
    pairwise_distill_mode: str = "all"
    attn_impl: Optional[str] = None

    def setup(self):
        common = dict(
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            use_decoder=self.use_decoder,
            pos_enc=self.pos_enc,
            use_text_pos_enc=self.use_text_pos_enc,
            random_pos_start=self.random_pos_start,
            use_audio=self.use_audio,
            video_embed_dim=self.video_embed_dim,
            text_embed_dim=self.text_embed_dim,
            audio_embed_dim=self.audio_embed_dim,
            feature_dim=self.feature_dim,
            use_distill_nce_loss=self.use_distill_nce_loss,
            multi_view=self.multi_view,
            num_max_views=self.num_max_views,
            use_pairwise_distill_nce_loss=self.use_pairwise_distill_nce_loss,
            pairwise_distill_mode=self.pairwise_distill_mode,
            attn_impl=self.attn_impl,
        )
        self.trunk = ExoGroundingTransformer(**common)
        if self.vi_encoder_type == "mlp":
            self.vi_encoder = ViewInvariantMLP(video_embed_dim=self.video_embed_dim)
        elif self.vi_encoder_type == "transformer":
            # forward the shared config the reference trainer passes to its
            # VI model from the same args namespace as the grounding trunk
            # (main_egoexo4d_distributed.py:628-644): pos-enc flavor, random
            # pos start, and the multi-view tiling must match the trunk or
            # the frozen pre-pass diverges from the checkpoint it restores
            self.vi_encoder = ViewInvariantEncoder(
                num_encoder_layers=self.num_encoder_layers,
                pos_enc=self.pos_enc,
                random_pos_start=self.random_pos_start,
                video_embed_dim=self.video_embed_dim,
                feature_dim=self.feature_dim,
                use_distill_nce_loss=True,
                # unconditional, matching the trunk's forwarding above: a
                # half-gated value would give the two submodules different
                # pos-table tilings for the same stitched input (the
                # reference normalizes num_max_views once at the args level,
                # main_egoexo4d_distributed.py:609)
                num_max_views=self.num_max_views,
                attn_impl=self.attn_impl,
            )
        else:
            self.vi_encoder = None

    def __call__(
        self,
        video_embed,
        lang_embed,
        video_padding_mask,
        lang_padding_mask,
        audio_embed=None,
        audio_padding_mask=None,
        egocentric_video_embed=None,
        view_mask=None,
        interpolate_from=None,
        deterministic: bool = True,
    ):
        if self.vi_encoder is not None:
            # deterministic must reach the VI pre-pass: the reference draws
            # the random pos start during training even under no_grad
            # (vi_encoder.py:146-150)
            vi_out = self.vi_encoder(
                video_embed, lang_embed, video_padding_mask, lang_padding_mask,
                egocentric_video_embed=egocentric_video_embed,
                deterministic=deterministic,
            )
            vi_video = jax.lax.stop_gradient(vi_out["high_dim_features"])
        else:
            vi_video = video_embed

        out = self.trunk(
            vi_video, lang_embed, video_padding_mask, lang_padding_mask,
            audio_embed, audio_padding_mask, egocentric_video_embed, view_mask,
            interpolate_from, deterministic,
        )
        if self.use_distill_nce_loss and egocentric_video_embed is not None:
            out["distill_infonce_loss"] = info_nce_diag(
                out["high_dim_features"], egocentric_video_embed
            )
        elif self.multi_view and self.use_pairwise_distill_nce_loss:
            if self.pairwise_distill_mode == "all":
                vm = view_mask
            else:
                # 'unmasked' derives availability from the stitched timestep
                # padding mask: view v exists iff any of its Tv slots is real
                # (pairwise_view_info_nce's contract is a (B, V) view mask)
                b = video_padding_mask.shape[0]
                vm = jnp.any(
                    ~video_padding_mask.reshape(b, self.num_max_views, -1),
                    axis=-1,
                )
            out["distill_infonce_loss"] = pairwise_view_info_nce(
                out["high_dim_features"], vm, self.num_max_views
            )
        return out

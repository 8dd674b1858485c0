"""View-invariant (exo -> ego) encoders.

``ViewInvariantEncoder`` — transformer variant (reference model/vi_encoder.py:8-163):
video-only TemporalEncoder over projected features + exo_feature_proj back up
to the 4096-d feature space; returns low/high-dim features.

``ViewInvariantMLP`` — the variant actually trained and loaded by the
reference pipeline (reference model/vi_encoder.py:166-256,
train/main_egoexo4d_distributed.py:628,679): 4096->4096 no-bias Linear ->
LayerNorm -> 2-layer ReLU MLP, identity-shaped in and out.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from exoground_tpu.ops.blocks import (
    LN_EPS,
    TemporalEncoder,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from exoground_tpu.ops.pos_embed import (
    get_position_embedding_sine,
    random_pos_start,
    slice_or_interpolate_pos_embed,
)


class ViewInvariantEncoder(nn.Module):
    num_encoder_layers: int = 2
    pos_enc: str = "learned"
    random_pos_start: int = 1
    video_embed_dim: int = 4096
    feature_dim: int = 512
    use_distill_nce_loss: bool = True
    num_max_views: int = 1
    heads: int = 8
    max_pos: int = 1024
    attn_impl: Optional[str] = None

    def setup(self):
        w = self.feature_dim
        self.video_unimodal_encoder = TemporalEncoder(w, self.num_encoder_layers, self.heads)
        init01 = nn.initializers.normal(0.01)
        self.video_pre_proj = nn.Dense(w, use_bias=False, kernel_init=init01)
        self.ln_video_init = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_position_init = nn.LayerNorm(epsilon=LN_EPS)
        self.ln_video_post_enc = nn.LayerNorm(epsilon=LN_EPS)
        if self.use_distill_nce_loss:
            # not in the reference re-init list: torch nn.Linear defaults
            self.exo_feature_proj = nn.Dense(
                self.video_embed_dim,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(w),
            )
        if self.pos_enc == "learned":
            self.temporal_pos_embed = self.param(
                "temporal_pos_embed", nn.initializers.normal(0.01), (self.max_pos, w)
            )
        else:
            self.temporal_pos_embed = get_position_embedding_sine(w, self.max_pos)

    def __call__(
        self,
        video_embed,
        lang_embed=None,
        video_padding_mask=None,
        lang_padding_mask=None,
        audio_embed=None,
        audio_padding_mask=None,
        egocentric_video_embed=None,
        view_mask=None,
        interpolate_from=None,
        deterministic: bool = True,
    ):
        b, t, _ = video_embed.shape
        if video_padding_mask is None:
            video_padding_mask = jnp.zeros((b, t), dtype=bool)
        x = self.ln_video_init(self.video_pre_proj(video_embed))
        seq_len = t // self.num_max_views
        start = 0
        if interpolate_from is None and self.random_pos_start and not deterministic:
            start = random_pos_start(self.make_rng("pos"), seq_len)
        pos = slice_or_interpolate_pos_embed(
            self.temporal_pos_embed, seq_len, interpolate_from, start
        )
        x = x + self.ln_position_init(jnp.tile(pos, (self.num_max_views, 1)))[None]
        stages = self.video_unimodal_encoder(x, video_padding_mask, impl=self.attn_impl)
        stages = stages.at[:, -1].set(self.ln_video_post_enc(stages[:, -1]))
        feats = stages.mean(axis=1)  # (B, T, C)
        out = {"low_dim_features": feats}
        out["high_dim_features"] = (
            self.exo_feature_proj(feats) if self.use_distill_nce_loss else feats
        )
        return out


class ViewInvariantMLP(nn.Module):
    video_embed_dim: int = 4096

    def setup(self):
        init01 = nn.initializers.normal(0.01)
        self.video_pre_proj = nn.Dense(self.video_embed_dim, use_bias=False, kernel_init=init01)
        self.ln_video_init = nn.LayerNorm(epsilon=LN_EPS)
        self.mlp_fc1 = nn.Dense(self.video_embed_dim, kernel_init=init01)
        self.mlp_fc2 = nn.Dense(self.video_embed_dim, kernel_init=init01)

    def __call__(
        self,
        video_embed,
        lang_embed=None,
        video_padding_mask=None,
        lang_padding_mask=None,
        audio_embed=None,
        audio_padding_mask=None,
        egocentric_video_embed=None,
        view_mask=None,
        interpolate_from=None,
        deterministic: bool = True,
    ):
        x = self.ln_video_init(self.video_pre_proj(video_embed))
        x = self.mlp_fc2(nn.relu(self.mlp_fc1(x)))
        return {"low_dim_features": x, "high_dim_features": x}

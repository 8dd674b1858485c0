"""Numerical parity: ViewInvariantMLP / ViewInvariantEncoder vs the torch
reference (model/vi_encoder.py), through the checkpoint converters."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/model"

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]


def test_vi_mlp_parity():
    import torch

    sys.path.insert(0, REF)
    import vi_encoder as ref_vi

    import jax.numpy as jnp

    from exoground_tpu.models.vi_encoder import ViewInvariantMLP
    from exoground_tpu.utils.convert import convert_vi_mlp_state_dict

    torch.manual_seed(0)
    tmodel = ref_vi.ViewInvariantMLP(video_embed_dim=48).eval()
    b, t = 2, 10
    rng = np.random.RandomState(0)
    video = rng.randn(b, t, 48).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(video), None,
            torch.zeros(b, t, dtype=torch.bool), None,
        )

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_vi_mlp_state_dict(state)
    model = ViewInvariantMLP(video_embed_dim=48)
    out = model.apply(
        {"params": params}, jnp.asarray(video), None,
        jnp.zeros((b, t), bool), None,
    )
    for key in ("low_dim_features", "high_dim_features"):
        a = np.asarray(out[key])
        r = ref[key].numpy()
        rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-8)
        assert rel < 2e-5, (key, rel)


def test_keystep_grounding_model_parity():
    """Keystep GroundingModel (frozen VI pre-pass + in-forward distill loss,
    reference keystep_ground_model.py:13-408) vs our wrapper."""
    import torch

    sys.path.insert(0, REF)
    import keystep_ground_model as ref_ks
    import vi_encoder as ref_vi

    import jax.numpy as jnp

    from exoground_tpu.models.grounding import GroundingModel
    from exoground_tpu.utils.convert import convert_grounding_state_dict

    torch.manual_seed(0)
    c = 48
    vi = ref_vi.ViewInvariantMLP(video_embed_dim=c).eval()
    tmodel = ref_ks.GroundingModel(
        num_encoder_layers=1, num_decoder_layers=1, random_pos_start=0,
        video_embed_dim=c, text_embed_dim=c, feature_dim=64,
        use_distill_nce_loss=True, vi_encoder=vi,
    ).eval()

    b, t, n = 2, 10, 3
    rng = np.random.RandomState(0)
    video = rng.randn(b, t, c).astype(np.float32)
    lang = rng.randn(b, n, c).astype(np.float32)
    ego = rng.randn(b, t, c).astype(np.float32)
    vmask = np.zeros((b, t), bool)
    lmask = np.zeros((b, n), bool)

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(video), torch.from_numpy(lang),
            torch.from_numpy(vmask), torch.from_numpy(lmask),
            egocentric_video_embed=torch.from_numpy(ego),
        )

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_grounding_state_dict(state)
    model = GroundingModel(
        vi_encoder_type="mlp", num_encoder_layers=1, num_decoder_layers=1,
        video_embed_dim=c, text_embed_dim=c, feature_dim=64,
        use_distill_nce_loss=True, attn_impl="xla",
    )
    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(lang),
        jnp.asarray(vmask), jnp.asarray(lmask),
        egocentric_video_embed=jnp.asarray(ego), deterministic=True,
    )
    a = np.asarray(out["interval_preds"])
    r = ref["interval_preds"].numpy()
    rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-8)
    assert rel < 2e-4, rel
    d_ours = float(out["distill_infonce_loss"])
    d_ref = float(ref["distill_infonce_loss"])
    assert abs(d_ours - d_ref) / (abs(d_ref) + 1e-6) < 2e-4, (d_ours, d_ref)


def test_vi_transformer_encoder_parity():
    """Transformer ViewInvariantEncoder (reference vi_encoder.py:8-163) vs
    ours through convert_vi_encoder_state_dict, incl. the multi-view pos
    tiling (seq_len = T // num_max_views, repeated per view)."""
    import torch

    sys.path.insert(0, REF)
    import vi_encoder as ref_vi

    import jax.numpy as jnp

    from exoground_tpu.models.vi_encoder import ViewInvariantEncoder
    from exoground_tpu.utils.convert import convert_vi_encoder_state_dict

    torch.manual_seed(0)
    c, w, views = 48, 32, 2
    tmodel = ref_vi.ViewInvariantEncoder(
        num_encoder_layers=2, random_pos_start=0, video_embed_dim=c,
        feature_dim=w, use_distill_nce_loss=True,
        multi_view=True, num_max_views=views,
    ).eval()

    b, t = 2, 10 * views
    rng = np.random.RandomState(0)
    video = rng.randn(b, t, c).astype(np.float32)
    ego = rng.randn(b, t, c).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(video), None,
            torch.zeros(b, t, dtype=torch.bool), None,
            egocentric_video_embed=torch.from_numpy(ego),
        )

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_vi_encoder_state_dict(state)
    model = ViewInvariantEncoder(
        num_encoder_layers=2, random_pos_start=0, video_embed_dim=c,
        feature_dim=w, use_distill_nce_loss=True, num_max_views=views,
        attn_impl="xla",
    )
    out = model.apply(
        {"params": params}, jnp.asarray(video), None,
        jnp.zeros((b, t), bool), None,
        egocentric_video_embed=jnp.asarray(ego), deterministic=True,
    )
    for key in ("low_dim_features", "high_dim_features"):
        a = np.asarray(out[key])
        r = ref[key].numpy()
        rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-8)
        assert rel < 2e-5, (key, rel)

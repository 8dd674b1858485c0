"""Numerical parity: converted torch ExoGroundingTransformer vs our rebuild.

Same oracle pattern as test_oracle_tan.py: a randomly-initialized reference
model (exo_ground_model.py, loaded from /root/reference — not shipped) is
converted via utils/convert.convert_exoground_state_dict; interval
predictions must match ours, covering the uni-modal encoders, stage
averaging (exo_ground_model.py:153-154), joint encoder over concatenated
sequences, the decoder with dual padding masks, and the grounding head.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/model"

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]


def test_exoground_forward_parity():
    import torch

    sys.path.insert(0, REF)
    import exo_ground_model  # reference oracle

    import jax.numpy as jnp

    from exoground_tpu.models import ExoGroundingTransformer
    from exoground_tpu.utils.convert import convert_exoground_state_dict

    torch.manual_seed(0)
    tmodel = exo_ground_model.ExoGroundingTransformer(
        num_encoder_layers=2, num_decoder_layers=2,
        random_pos_start=0, video_embed_dim=64, text_embed_dim=64,
        feature_dim=128, use_distill_nce_loss=False,
    ).eval()

    b, t, n = 2, 12, 4
    rng = np.random.RandomState(0)
    video = rng.randn(b, t, 64).astype(np.float32)
    lang = rng.randn(b, n, 64).astype(np.float32)
    vmask = np.zeros((b, t), bool)
    vmask[1, -3:] = True
    lmask = np.zeros((b, n), bool)
    lmask[0, -1:] = True

    with torch.no_grad():
        ref = tmodel(
            torch.from_numpy(video), torch.from_numpy(lang),
            torch.from_numpy(vmask), torch.from_numpy(lmask),
        )

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_exoground_state_dict(state)
    model = ExoGroundingTransformer(
        num_encoder_layers=2, num_decoder_layers=2,
        video_embed_dim=64, text_embed_dim=64, feature_dim=128,
        attn_impl="xla",
    )
    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(lang),
        jnp.asarray(vmask), jnp.asarray(lmask), deterministic=True,
    )

    a = np.asarray(out["interval_preds"])
    r = ref["interval_preds"].numpy()
    assert a.shape == r.shape
    rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-8)
    assert rel < 2e-4, rel

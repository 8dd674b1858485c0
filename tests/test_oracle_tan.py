"""Numerical parity: converted torch TemporalAligner vs our flax rebuild.

The strongest checkpoint-parity guarantee available without the released
weights: a randomly-initialized *reference* TAN (torch, loaded from
/root/reference as an oracle — not shipped) is converted through
utils/convert.convert_tan_state_dict and must produce the same logits as our
TemporalAligner on identical inputs, including the per-layer intermediate
protocol (tfm_model.py:53-54 pop/append quirk), packed-QKV attention with
key-padding masks, LayerNorm placement, and the alignability head.
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


@pytest.fixture(scope="module")
def torch_tan():
    import torch

    sys.path.insert(0, REF)
    import tan_model  # reference oracle

    torch.manual_seed(0)
    model = tan_model.TemporalAligner(
        num_encoder_layers=2, num_decoder_layers=2,
        random_pos_start=0, use_alignability_head=1,
    ).eval()
    return model


def test_tan_forward_parity(torch_tan):
    import jax
    import jax.numpy as jnp
    import torch

    from exoground_tpu.models import TemporalAligner
    from exoground_tpu.utils.convert import convert_tan_state_dict

    b, t, n = 2, 16, 3
    rng = np.random.RandomState(0)
    video = rng.randn(b, t, 4096).astype(np.float32)
    lang = rng.randn(b, n, 4096).astype(np.float32)
    vmask = np.zeros((b, t), bool)
    vmask[1, -4:] = True  # exercise key-padding on one row
    lmask = np.zeros((b, n), bool)
    lmask[0, -1:] = True

    with torch.no_grad():
        ref = torch_tan(
            torch.from_numpy(video), torch.from_numpy(lang),
            torch.from_numpy(vmask), torch.from_numpy(lmask),
            text_timestamp=None,
        )

    state = {k: v.detach().numpy() for k, v in torch_tan.state_dict().items()}
    params = convert_tan_state_dict(state)
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2,
        use_alignability_head=1, attn_impl="xla",
    )
    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(lang),
        jnp.asarray(vmask), jnp.asarray(lmask), deterministic=True,
    )

    for ours, theirs in (
        ("logits_dual", "logits_dual"),
        ("logits_joint", "logits_joint"),
        ("dual_logits_alignability", "dual_logits_alignability"),
        ("joint_logits_alignability", "joint_logits_alignability"),
    ):
        a = np.asarray(out[ours])
        r = ref[theirs].numpy()
        assert a.shape == r.shape, (ours, a.shape, r.shape)
        rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-8)
        assert rel < 2e-4, (ours, rel)


def test_tan_eval_entry_points_parity(torch_tan):
    """get_text_visual_sim_joint/_dual (tan_model.py:231-306) vs our
    text_visual_sim method on the same converted weights."""
    import jax.numpy as jnp
    import torch

    from exoground_tpu.models import TemporalAligner
    from exoground_tpu.utils.convert import convert_tan_state_dict

    b, t, n = 1, 20, 4
    rng = np.random.RandomState(1)
    video = rng.randn(b, t, 4096).astype(np.float32)
    lang = rng.randn(b, n, 4096).astype(np.float32)

    with torch.no_grad():
        sim_joint = torch_tan.get_text_visual_sim_joint(
            torch.from_numpy(video), torch.from_numpy(lang)
        )
        sim_dual = torch_tan.get_text_visual_sim_dual(
            torch.from_numpy(video), torch.from_numpy(lang)
        )

    state = {k: v.detach().numpy() for k, v in torch_tan.state_dict().items()}
    params = convert_tan_state_dict(state)
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2,
        use_alignability_head=1, attn_impl="xla",
    )
    out = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(lang),
        method=TemporalAligner.text_visual_sim,
    )
    a_joint = np.asarray(out["sim"])
    a_dual = np.asarray(out["dual-sim"])
    r_joint = sim_joint["sim"].numpy() if isinstance(sim_joint, dict) else sim_joint.numpy()
    r_dual = sim_dual["sim"].numpy() if isinstance(sim_dual, dict) else sim_dual.numpy()
    for a, r, name in ((a_joint, r_joint, "joint"), (a_dual, r_dual, "dual")):
        a = a.reshape(r.shape)
        rel = np.abs(a - r).max() / (np.abs(r).max() + 1e-8)
        assert rel < 2e-4, (name, rel)

"""Torch checkpoint -> JAX param-pytree conversion.

The parity checkpoint for HTM-Align (``cotrain_word2vec_htm-370k_len64_e6d6
.pth.tar``, reference readme.md:44-45) and the MIL-NCE S3D weights
(``s3d_howto100m.pth``) are torch state dicts. This module maps their key
layout (reference model/tan_model.py, model/word2vec_model.py,
model/s3d_milnce/s3dg.py) onto our flax param trees:

  torch Linear weight (out, in)          -> kernel (in, out)  [transpose]
  nn.MultiheadAttention in_proj_weight   -> in_proj_kernel (C, 3C) [transpose]
  LayerNorm weight/bias                  -> scale/bias
  Embedding weight                       -> word_embd array

Checkpoint dict format (reference utils/utils.py + main.py:532-537):
{'epoch', 'state_dict', 'best_acc', 'optimizer', 'iteration'}; state_dict keys
may carry 'module.' (DDP) and 'online.'/'target.' (EMA twin) prefixes.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth(.tar) file into {key: np.ndarray} without keeping
    torch tensors around. Requires torch (CPU build is fine)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.detach().cpu().numpy() for k, v in state.items() if hasattr(v, "detach")}


def strip_prefix(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Keep only keys under ``prefix`` and strip it ('module.', 'online.', ...)."""
    out = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    return out if out else dict(state)


def _ln(state, key):
    return {"scale": state[f"{key}.weight"], "bias": state[f"{key}.bias"]}


def _dense(state, key, bias=True):
    out = {"kernel": np.ascontiguousarray(state[f"{key}.weight"].T)}
    if bias and f"{key}.bias" in state:
        out["bias"] = state[f"{key}.bias"]
    return out


def _attn(state, key):
    return {
        "in_proj_kernel": np.ascontiguousarray(state[f"{key}.in_proj_weight"].T),
        "in_proj_bias": state[f"{key}.in_proj_bias"],
        "out_proj_kernel": np.ascontiguousarray(state[f"{key}.out_proj.weight"].T),
        "out_proj_bias": state[f"{key}.out_proj.bias"],
    }


def _encoder_block(state, key):
    return {
        "attn": _attn(state, f"{key}.attn"),
        "ln_1": _ln(state, f"{key}.ln_1"),
        "ln_2": _ln(state, f"{key}.ln_2"),
        "mlp": {
            "c_fc": _dense(state, f"{key}.mlp.c_fc"),
            "c_proj": _dense(state, f"{key}.mlp.c_proj"),
        },
    }


def _decoder_block(state, key):
    return {
        "self_attn": _attn(state, f"{key}.self_attn"),
        "attn": _attn(state, f"{key}.attn"),
        "ln_1": _ln(state, f"{key}.ln_1"),
        "ln_2": _ln(state, f"{key}.ln_2"),
        "ln_3": _ln(state, f"{key}.ln_3"),
        "mlp": {
            "c_fc": _dense(state, f"{key}.mlp.c_fc"),
            "c_proj": _dense(state, f"{key}.mlp.c_proj"),
        },
    }


def _encoder_stack(state, key, num_layers):
    return {
        f"resblocks_{i}": _encoder_block(state, f"{key}.resblocks.{i}")
        for i in range(num_layers)
    }


def _decoder_stack(state, key, num_layers):
    return {
        f"resblocks_{i}": _decoder_block(state, f"{key}.resblocks.{i}")
        for i in range(num_layers)
    }


def _count_layers(state, key):
    n = 0
    while f"{key}.resblocks.{n}.ln_1.weight" in state:
        n += 1
    return n


def convert_tan_state_dict(
    state: Dict[str, np.ndarray], twin_branch: Optional[str] = None
) -> Dict:
    """TemporalAligner torch state dict -> flax params dict.

    twin_branch: 'online' or 'target' to extract one branch of a cotrain
    (TwinTemporalAligner) checkpoint; None for plain checkpoints.
    """
    state = strip_prefix(state, "module.")
    if twin_branch:
        state = strip_prefix(state, f"{twin_branch}.")

    n_enc = _count_layers(state, "video_temporal_encoder")
    n_joint = _count_layers(state, "joint_temporal_encoder")
    params = {
        "video_temporal_encoder": _encoder_stack(state, "video_temporal_encoder", n_enc),
        "joint_temporal_encoder": _encoder_stack(state, "joint_temporal_encoder", n_joint),
        "video_pre_proj": _dense(state, "video_pre_proj", bias=False),
        "text_pre_proj": _dense(state, "text_pre_proj", bias=False),
        "ln_text_init": _ln(state, "ln_text_init"),
        "ln_video_init": _ln(state, "ln_video_init"),
        "ln_position_init": _ln(state, "ln_position_init"),
        "ln_video_post_enc": _ln(state, "ln_video_post_enc"),
        "ln_joint_post_enc": _ln(state, "ln_joint_post_enc"),
        "text_temporal_pos_embed": state["text_temporal_pos_embed"],
    }
    if "temporal_pos_embed" in state:  # learned (param) or sine (buffer) — same key
        params["temporal_pos_embed"] = state["temporal_pos_embed"]
    if "binary_head.weight" in state:
        params["binary_head"] = _dense(state, "binary_head")
    return params


def convert_exoground_state_dict(state: Dict[str, np.ndarray]) -> Dict:
    """ExoGroundingTransformer torch state dict -> flax params
    (reference model/exo_ground_model.py:12-105 key layout)."""
    state = strip_prefix(state, "module.")
    n_enc = _count_layers(state, "multi_modal_encoder")
    params = {
        "multi_modal_encoder": _encoder_stack(state, "multi_modal_encoder", n_enc),
        "video_unimodal_encoder": _encoder_stack(
            state, "video_unimodal_encoder", _count_layers(state, "video_unimodal_encoder")
        ),
        "text_unimodal_encoder": _encoder_stack(
            state, "text_unimodal_encoder", _count_layers(state, "text_unimodal_encoder")
        ),
        "grounding_head": _dense(state, "grounding_head"),
        "video_pre_proj": _dense(state, "video_pre_proj", bias=False),
        "text_pre_proj": _dense(state, "text_pre_proj", bias=False),
        "ln_text_init": _ln(state, "ln_text_init"),
        "ln_video_init": _ln(state, "ln_video_init"),
        "ln_position_init": _ln(state, "ln_position_init"),
        "ln_joint_post_enc": _ln(state, "ln_joint_post_enc"),
        "ln_video_post_enc": _ln(state, "ln_video_post_enc"),
        "ln_text_post_enc": _ln(state, "ln_text_post_enc"),
        "temporal_pos_embed": state["temporal_pos_embed"],
        "text_temporal_pos_embed": state["text_temporal_pos_embed"],
    }
    n_dec = _count_layers(state, "decoder")
    if n_dec:
        params["decoder"] = _decoder_stack(state, "decoder", n_dec)
    if "exo_feature_proj.weight" in state:
        params["exo_feature_proj"] = _dense(state, "exo_feature_proj")
    if "audio_pre_proj.weight" in state:
        params["audio_pre_proj"] = _dense(state, "audio_pre_proj", bias=False)
        params["ln_audio_init"] = _ln(state, "ln_audio_init")
    return params


def convert_vi_encoder_state_dict(state: Dict[str, np.ndarray]) -> Dict:
    """Transformer ViewInvariantEncoder torch state dict -> flax params
    (reference model/vi_encoder.py:8-163: pre-proj + pos-embed LNs +
    TemporalEncoder + optional exo_feature_proj)."""
    state = strip_prefix(state, "module.")
    n_enc = _count_layers(state, "video_unimodal_encoder")
    params = {
        "video_unimodal_encoder": _encoder_stack(
            state, "video_unimodal_encoder", n_enc
        ),
        "video_pre_proj": _dense(state, "video_pre_proj", bias=False),
        "ln_video_init": _ln(state, "ln_video_init"),
        "ln_position_init": _ln(state, "ln_position_init"),
        "ln_video_post_enc": _ln(state, "ln_video_post_enc"),
    }
    if "temporal_pos_embed" in state:  # learned param or sine buffer
        params["temporal_pos_embed"] = state["temporal_pos_embed"]
    if "exo_feature_proj.weight" in state:
        params["exo_feature_proj"] = _dense(state, "exo_feature_proj")
    return params


def convert_vi_mlp_state_dict(state: Dict[str, np.ndarray]) -> Dict:
    """ViewInvariantMLP torch state dict -> flax params
    (reference model/vi_encoder.py:166-256: pre_proj + LN + 2-layer MLP)."""
    state = strip_prefix(state, "module.")
    return {
        "video_pre_proj": _dense(state, "video_pre_proj", bias=False),
        "ln_video_init": _ln(state, "ln_video_init"),
        "mlp_fc1": _dense(state, "mlp.0"),
        "mlp_fc2": _dense(state, "mlp.2"),
    }


def convert_word2vec_from_s3d(state: Dict[str, np.ndarray]) -> Dict:
    """MIL-NCE S3D checkpoint -> frozen word2vec text-tower params
    (reference model/word2vec_model.py:76-102 pulls text_module.{word_embd,fc1,fc2})."""
    prefix = "text_module."
    if not any(k.startswith(prefix) for k in state):
        prefix = ""
    return {
        "word_embd": state[f"{prefix}word_embd.weight"],
        "fc1": _dense(state, f"{prefix}fc1"),
        "fc2": _dense(state, f"{prefix}fc2"),
    }


def _conv3d(state, key):
    """torch Conv3d weight (O, I, kT, kH, kW) -> flax kernel (kT, kH, kW, I, O)."""
    w = state[f"{key}.weight"]
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))}


def _bn3d(state, key):
    """torch BatchNorm3d -> flax BatchNorm param + batch_stats halves."""
    return (
        {"scale": state[f"{key}.weight"], "bias": state[f"{key}.bias"]},
        {"mean": state[f"{key}.running_mean"], "var": state[f"{key}.running_var"]},
    )


def convert_s3d_state_dict(state: Dict[str, np.ndarray]) -> Dict:
    """MIL-NCE S3D torch checkpoint -> {'params', 'batch_stats'} for models/s3d.py.

    Key layout follows reference model/s3d_milnce/s3dg.py:250-310 module names
    (conv1, conv_2b/2c, gating, mixed_3b..5c with conv_b*/gating_b* children).
    """
    state = strip_prefix(state, "module.")
    params: Dict = {}
    stats: Dict = {}

    def put(path, key, separable):
        node_p, node_s = params, stats
        for part in path[:-1]:
            node_p = node_p.setdefault(part, {})
            node_s = node_s.setdefault(part, {})
        name = path[-1]
        p: Dict = {}
        s: Dict = {}
        p["conv1"] = _conv3d(state, f"{key}.conv1")
        p["bn1"], s["bn1"] = _bn3d(state, f"{key}.bn1")
        if separable:
            p["conv2"] = _conv3d(state, f"{key}.conv2")
            p["bn2"], s["bn2"] = _bn3d(state, f"{key}.bn2")
        node_p[name] = p
        node_s[name] = s

    def put_gating(path, key):
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = {"fc": _dense(state, f"{key}.fc")}

    put(["conv1"], "conv1", separable=False)
    put(["conv_2b"], "conv_2b", separable=False)
    put(["conv_2c"], "conv_2c", separable=True)
    put_gating(["gating"], "gating")
    blocks = [
        "mixed_3b", "mixed_3c", "mixed_4b", "mixed_4c", "mixed_4d",
        "mixed_4e", "mixed_4f", "mixed_5b", "mixed_5c",
    ]
    for blk in blocks:
        put([blk, "conv_b0"], f"{blk}.conv_b0", separable=False)
        put([blk, "conv_b1_a"], f"{blk}.conv_b1_a", separable=False)
        put([blk, "conv_b1_b"], f"{blk}.conv_b1_b", separable=True)
        put([blk, "conv_b2_a"], f"{blk}.conv_b2_a", separable=False)
        put([blk, "conv_b2_b"], f"{blk}.conv_b2_b", separable=True)
        put([blk, "conv_b3_b"], f"{blk}.conv_b3_b", separable=False)
        for g in ("gating_b0", "gating_b1", "gating_b2", "gating_b3"):
            put_gating([blk, g], f"{blk}.{g}")
    if "fc.weight" in state:
        params["fc"] = _dense(state, "fc")
    return {"params": params, "batch_stats": stats}


def convert_sentence_embedding_from_s3d(state: Dict[str, np.ndarray]) -> Dict:
    """S3D checkpoint -> Sentence_Embedding params (s3dg.py:186-239).

    Same {word_embd, fc1, fc2} mapping as the word2vec tower (the reference's
    Sentence_Embedding and Word2VecModel share the layout) after stripping
    the DDP prefix; delegates so the mapping lives in one place."""
    return convert_word2vec_from_s3d(strip_prefix(state, "module."))


def convert_grounding_state_dict(
    state: Dict[str, np.ndarray], vi_state: Optional[Dict[str, np.ndarray]] = None
) -> Dict:
    """Keystep GroundingModel torch state -> flax params for
    models/grounding.GroundingModel ({'trunk', 'vi_encoder'} submodules).

    The reference model (keystep_ground_model.py:13-408) inlines the
    ExoGroundingTransformer structure with identical key names, so the trunk
    converts via convert_exoground_state_dict; the frozen VI encoder params
    come from the vi_encoder.* prefix of the same checkpoint or a separate
    state dict."""
    state = strip_prefix(state, "module.")
    if vi_state is None:
        vi_state = {
            k[len("vi_encoder."):]: v
            for k, v in state.items() if k.startswith("vi_encoder.")
        }
    trunk_state = {
        k: v for k, v in state.items() if not k.startswith("vi_encoder.")
    }
    out = {"trunk": convert_exoground_state_dict(trunk_state)}
    if vi_state:
        # MLP vs transformer VI checkpoints are distinguished by their keys
        # (vi_encoder.py:166-256 vs :8-163); strip the DDP prefix FIRST so
        # 'module.'-saved external vi_state dicts route correctly
        vi_state = strip_prefix(vi_state, "module.")
        is_tfm = any(
            k.startswith("video_unimodal_encoder.") for k in vi_state
        )
        out["vi_encoder"] = (
            convert_vi_encoder_state_dict(vi_state)
            if is_tfm else convert_vi_mlp_state_dict(vi_state)
        )
    return out

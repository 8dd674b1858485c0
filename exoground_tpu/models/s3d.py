"""S3D-G (MIL-NCE) video backbone + Sentence_Embedding text module.

Rebuild of reference model/s3d_milnce/s3dg.py:27-379 and the end2end wrappers
(end2end/model_e2e.py:9-23, end2end/freeze_bn.py:6-37), designed for TPU:

  * NDHWC layout throughout (XLA's preferred conv layout on TPU; the
    reference is NCDHW) — the checkpoint converter transposes kernels;
  * the reference's own space-to-depth TPU trick is kept (s3dg.py:312-319):
    2x2x2 blocks fold into channels so conv1 runs stride-1 on a 24-channel
    input, mapping cleanly onto the MXU;
  * TF-style SAME maxpool (s3dg.py:153-183) is nn.max_pool(padding='SAME') —
    identical semantics, no explicit pad layers;
  * BatchNorm runs frozen by default (use_running_average=True): MIL-NCE
    inference and the HTM-AA finetune both freeze BN (freeze_bn.py) — this IS
    FrozenBN; pass train_bn=True for from-scratch training;
  * freeze_forward (s3dg.py:351-379) = stop_gradient through mixed_3c,
    exposed as the ``freeze_early`` flag.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class STConv3D(nn.Module):
    """Conv3D(+BN+ReLU), optionally separated into spatial then temporal
    convolutions (reference s3dg.py:93-150). NDHWC."""

    output_dim: int
    kernel_size: Sequence[int]  # (kT, kH, kW)
    stride: Any = 1
    padding: Any = 0
    separable: bool = False

    def _pad(self, p) -> Tuple:
        if isinstance(p, (tuple, list)):
            return tuple((x, x) for x in p)
        return ((p, p),) * 3

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        kt, kh, kw = self.kernel_size
        st = (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)
        pd = self._pad(self.padding)
        if self.separable and kt != 1:
            x = nn.Conv(
                self.output_dim, (1, kh, kw), strides=(1, st[1], st[2]),
                padding=((0, 0), pd[1], pd[2]), use_bias=False, name="conv1",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train_bn, momentum=0.9, name="bn1"
            )(x)
            x = nn.relu(x)
            x = nn.Conv(
                self.output_dim, (kt, 1, 1), strides=(st[0], 1, 1),
                padding=(pd[0], (0, 0), (0, 0)), use_bias=False, name="conv2",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train_bn, momentum=0.9, name="bn2"
            )(x)
            return nn.relu(x)
        x = nn.Conv(
            self.output_dim, (kt, kh, kw), strides=st, padding=pd,
            use_bias=False, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train_bn, momentum=0.9, name="bn1"
        )(x)
        return nn.relu(x)


class SelfGating(nn.Module):
    """Feature gating: sigmoid(fc(mean over D,H,W)) * x (s3dg.py:79-90)."""

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=(1, 2, 3))  # (B, C)
        w = jax.nn.sigmoid(nn.Dense(x.shape[-1], name="fc")(avg))
        return w[:, None, None, None, :] * x


def _same_maxpool(x, kernel: Tuple[int, int, int], stride: Tuple[int, int, int]):
    """TF-SAME 3-D maxpool (reference MaxPool3dTFPadding, s3dg.py:153-183)."""
    return nn.max_pool(
        x, window_shape=kernel, strides=stride, padding="SAME"
    )


class InceptionBlock(nn.Module):
    """4-branch S3D inception block w/ optional per-branch gating
    (s3dg.py:27-76)."""

    n0: int
    n1a: int
    n1b: int
    n2a: int
    n2b: int
    n3b: int
    gating: bool = True

    @property
    def output_dim(self):
        return self.n0 + self.n1b + self.n2b + self.n3b

    @nn.compact
    def __call__(self, x, train_bn: bool = False):
        b0 = STConv3D(self.n0, (1, 1, 1), name="conv_b0")(x, train_bn)
        b1 = STConv3D(self.n1a, (1, 1, 1), name="conv_b1_a")(x, train_bn)
        b1 = STConv3D(self.n1b, (3, 3, 3), padding=1, separable=True,
                      name="conv_b1_b")(b1, train_bn)
        b2 = STConv3D(self.n2a, (1, 1, 1), name="conv_b2_a")(x, train_bn)
        b2 = STConv3D(self.n2b, (3, 3, 3), padding=1, separable=True,
                      name="conv_b2_b")(b2, train_bn)
        b3 = _same_maxpool(x, (3, 3, 3), (1, 1, 1))
        b3 = STConv3D(self.n3b, (1, 1, 1), name="conv_b3_b")(b3, train_bn)
        if self.gating:
            b0 = SelfGating(name="gating_b0")(b0)
            b1 = SelfGating(name="gating_b1")(b1)
            b2 = SelfGating(name="gating_b2")(b2)
            b3 = SelfGating(name="gating_b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def space_to_depth_3d(x: jnp.ndarray) -> jnp.ndarray:
    """2x2x2 space-to-depth (reference s3dg.py:312-319), NDHWC variant.

    (B, T, H, W, C) -> (B, T/2, H/2, W/2, 8C) with the torch trick's exact
    channel ordering: output channel = (t2, h2, w2, c) with the original C
    slowest-varying after the 3 block bits — matching input.permute(0,3,5,7,
    1,...) so converted torch conv1 weights act identically.
    """
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # (B,T2,H2,W2, 2,2,2, C)
    return x.reshape(b, t // 2, h // 2, w // 2, 8 * c)


class S3D(nn.Module):
    """Full S3D-G trunk (s3dg.py:250-349). Input (B, T, H, W, 3) in [0, 1].

    Returns the mixed_5c global-average feature (B, 1024); apply ``fc`` for
    the joint 512-d embedding (the reference's forward returns the pooled
    trunk feature; MyS3D/e2e applies fc, end2end/model_e2e.py:17-22).
    """

    num_classes: int = 512
    gating: bool = True
    space_to_depth: bool = True

    @nn.compact
    def __call__(
        self, x, train_bn: bool = False, freeze_early: bool = False,
        return_embedding: bool = True,
    ):
        train_early = train_bn and not freeze_early
        if self.space_to_depth:
            x = space_to_depth_3d(x)
            net = STConv3D(64, (2, 4, 4), stride=1, padding=(1, 2, 2),
                           name="conv1")(x, train_early)
            net = net[:, 1:, 1:, 1:, :]  # TF-SAME crop (s3dg.py:327-329)
        else:
            net = STConv3D(64, (3, 7, 7), stride=2, padding=(1, 3, 3),
                           name="conv1")(x, train_early)
        net = _same_maxpool(net, (1, 3, 3), (1, 2, 2))
        net = STConv3D(64, (1, 1, 1), name="conv_2b")(net, train_early)
        net = STConv3D(192, (3, 3, 3), padding=1, separable=True,
                       name="conv_2c")(net, train_early)
        if self.gating:
            net = SelfGating(name="gating")(net)
        net = _same_maxpool(net, (1, 3, 3), (1, 2, 2))
        net = InceptionBlock(64, 96, 128, 16, 32, 32, name="mixed_3b")(net, train_early)
        net = InceptionBlock(128, 128, 192, 32, 96, 64, name="mixed_3c")(net, train_early)
        if freeze_early:  # freeze_forward (s3dg.py:351-379)
            net = jax.lax.stop_gradient(net)
        net = _same_maxpool(net, (3, 3, 3), (2, 2, 2))
        net = InceptionBlock(192, 96, 208, 16, 48, 64, name="mixed_4b")(net, train_bn)
        net = InceptionBlock(160, 112, 224, 24, 64, 64, name="mixed_4c")(net, train_bn)
        net = InceptionBlock(128, 128, 256, 24, 64, 64, name="mixed_4d")(net, train_bn)
        net = InceptionBlock(112, 144, 288, 32, 64, 64, name="mixed_4e")(net, train_bn)
        net = InceptionBlock(256, 160, 320, 32, 128, 128, name="mixed_4f")(net, train_bn)
        net = _same_maxpool(net, (2, 2, 2), (2, 2, 2))
        net = InceptionBlock(256, 160, 320, 32, 128, 128, name="mixed_5b")(net, train_bn)
        net = InceptionBlock(384, 192, 384, 48, 128, 128, name="mixed_5c")(net, train_bn)
        pooled = jnp.mean(net, axis=(1, 2, 3))  # (B, 1024)
        if return_embedding:
            return nn.Dense(self.num_classes, name="fc")(pooled)
        return pooled


def sentence_embedding_forward(
    params: Dict, input_ids: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """MIL-NCE text tower (reference Sentence_Embedding.forward,
    s3dg.py:231-239): frozen word embedding -> fc1 -> relu -> max over words
    (unmasked, parity) -> fc2."""
    x = jax.lax.stop_gradient(params["word_embd"][input_ids])
    x = jax.nn.relu(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    x = jnp.max(x, axis=1)
    x = x @ params["fc2"]["kernel"] + params["fc2"]["bias"]
    return {"text_embedding": x}

"""S3D backbone tests: shapes, space-to-depth ordering, torch-oracle parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: run with -m slow

from exoground_tpu.models.s3d import (
    S3D,
    sentence_embedding_forward,
    space_to_depth_3d,
)
from exoground_tpu.utils.convert import (
    convert_s3d_state_dict,
    convert_sentence_embedding_from_s3d,
)

REF = "/root/reference/model/s3d_milnce"


def test_space_to_depth_matches_torch_ordering():
    """Our NDHWC channel order must equal the reference NCDHW trick
    (s3dg.py:312-319) after layout conversion."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8, 3).astype(np.float32)  # NDHWC
    out = np.asarray(space_to_depth_3d(jnp.asarray(x)))  # (2,2,4,4,24)

    # reference formula in numpy on NCDHW
    xc = x.transpose(0, 4, 1, 2, 3)  # (B,C,T,H,W)
    b, c, t, h, w = xc.shape
    ref = xc.reshape(b, c, t // 2, 2, h // 2, 2, w // 2, 2)
    ref = ref.transpose(0, 3, 5, 7, 1, 2, 4, 6).reshape(
        b, 8 * c, t // 2, h // 2, w // 2
    )
    ref = ref.transpose(0, 2, 3, 4, 1)  # back to NDHWC
    np.testing.assert_allclose(out, ref)


def test_s3d_forward_shapes():
    model = S3D(num_classes=16)
    x = jnp.zeros((1, 16, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (1, 16)
    pooled = model.apply(variables, x, return_embedding=False)
    assert pooled.shape == (1, 1024)


def test_s3d_freeze_early_stops_gradients():
    model = S3D(num_classes=8)
    x = jnp.ones((1, 16, 32, 32, 3)) * 0.5
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, freeze_early=True,
        )
        return jnp.sum(out**2)

    grads = jax.grad(loss)(variables["params"])
    g_early = np.concatenate([
        np.ravel(g) for g in jax.tree_util.tree_leaves(grads["mixed_3b"])
    ])
    g_late = np.concatenate([
        np.ravel(g) for g in jax.tree_util.tree_leaves(grads["mixed_4b"])
    ])
    assert np.allclose(g_early, 0)
    assert np.abs(g_late).max() > 0


def test_sentence_embedding_formula():
    rng = np.random.RandomState(1)
    params = {
        "word_embd": rng.randn(50, 12).astype(np.float32),
        "fc1": {"kernel": rng.randn(12, 20).astype(np.float32),
                "bias": rng.randn(20).astype(np.float32)},
        "fc2": {"kernel": rng.randn(20, 8).astype(np.float32),
                "bias": rng.randn(8).astype(np.float32)},
    }
    ids = np.array([[3, 7, 0, 0], [1, 2, 4, 9]])
    out = np.asarray(sentence_embedding_forward(params, jnp.asarray(ids))["text_embedding"])
    # reference (s3dg.py:231-239): relu(fc1(embed)) -> max over words -> fc2
    e = params["word_embd"][ids]
    h = np.maximum(e @ params["fc1"]["kernel"] + params["fc1"]["bias"], 0)
    ref = h.max(axis=1) @ params["fc2"]["kernel"] + params["fc2"]["bias"]
    np.testing.assert_allclose(out, ref, rtol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_s3d_parity_with_torch_oracle():
    """Randomly-initialized torch S3D vs our converted flax S3D on the same
    input — validates conv/bn/pool/gating semantics and the converter."""
    import sys

    import torch

    sys.path.insert(0, REF)
    from s3dg import S3D as TorchS3D  # reference oracle, not shipped

    torch.manual_seed(0)
    tmodel = TorchS3D(dict_path=None, num_classes=24).eval()
    # randomize BN stats so frozen-BN math is actually exercised
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.5, 1.5)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 16, 64, 64).astype(np.float32)  # NCDHW in [0,1]
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()  # pooled trunk (1, 1024)

    state = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_s3d_state_dict(state)
    model = S3D(num_classes=24)
    out = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),  # NDHWC
            return_embedding=False,
        )
    )
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-8)
    assert rel < 2e-3, rel


def test_s3d_nce_step_8dev():
    """e2e finetune step on the virtual mesh: loss finite, frozen-early grads
    zero, text tower trains (end2end/main_nce.py parity)."""
    import optax

    from exoground_tpu.parallel import make_mesh, replicate, shard_batch
    from exoground_tpu.parallel.train_step import make_s3d_nce_step

    rng = np.random.RandomState(0)
    b, n, t, hw = 8, 1, 8, 32
    model = S3D(num_classes=16)
    video = rng.rand(b, n, t, hw, hw, 3).astype(np.float32)
    token = rng.randint(1, 50, (b, 6)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(video[0]))
    text_params = {
        "word_embd": rng.randn(50, 12).astype(np.float32),
        "fc1": {"kernel": rng.randn(12, 20).astype(np.float32),
                "bias": np.zeros(20, np.float32)},
        "fc2": {"kernel": rng.randn(20, 16).astype(np.float32),
                "bias": np.zeros(16, np.float32)},
    }
    params = {"s3d": variables["params"], "text": text_params}
    tx = optax.adamw(1e-4)
    mesh = make_mesh(8)
    # gather_negatives: with batch 1 per shard the local contrastive grid is
    # degenerate (softmax over one element); gathering makes it the global 8x8
    step = make_s3d_nce_step(model, tx, mesh, freeze_early=True,
                             gather_negatives=True)
    # snapshot BEFORE the step: donation consumes the device buffers (the
    # replicated arrays can alias params' own buffers on the origin device)
    conv1_before = jax.device_get(params["s3d"]["conv1"])
    params_host = jax.device_get(params)
    p = replicate(params, mesh)
    bs = replicate(variables["batch_stats"], mesh)
    o = replicate(tx.init(params), mesh)
    batch = shard_batch({"video": video, "token": token}, mesh)
    p2, bs2, o2, metrics = step(p, bs, o, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["top1-per-text"]) <= 1.0
    # frozen-early: conv1 unchanged, text fc2 moved
    a0 = jax.tree_util.tree_leaves(conv1_before)
    a1 = jax.tree_util.tree_leaves(jax.device_get(p2["s3d"]["conv1"]))
    assert all(np.allclose(x, y) for x, y in zip(a0, a1))
    assert not np.allclose(text_params["fc2"]["kernel"],
                           jax.device_get(p2["text"]["fc2"]["kernel"]))

    # fused scan variant: 2 steps, one dispatch, per-step stacked metrics
    step2 = make_s3d_nce_step(model, tx, mesh, freeze_early=True,
                              gather_negatives=True, scan_steps=2)
    stacked = {
        "video": np.stack([video, video]),
        "token": np.stack([token, token]),
    }
    p = replicate(params_host, mesh)
    o = replicate(tx.init(params_host), mesh)
    p3, bs3, o3, ms = step2(p, bs, o, shard_batch(stacked, mesh, dim=1),
                            jax.random.PRNGKey(0))
    assert ms["loss"].shape == (2,)
    assert np.isfinite(np.asarray(ms["loss"])).all()


def test_s3d_train_bn_stats_stay_f32_under_amp():
    """train_bn + bf16 compute must accumulate BN running stats at f32:
    casting the stored stats to bf16 each step quantizes away sub-0.4%
    increments (torch AMP keeps BN in f32). With all-zero inputs every batch
    moment is exactly 0, so new = 0.9 * old exactly; old = 1 + 1/512 is NOT
    bf16-representable (rounds to 1.0), making the two behaviours cleanly
    distinguishable: f32 accumulation -> 0.9017578, bf16 round-trip -> 0.9."""
    import optax

    from exoground_tpu.parallel import make_mesh, replicate, shard_batch
    from exoground_tpu.parallel.train_step import make_s3d_nce_step

    rng = np.random.RandomState(0)
    b, n, t, hw = 8, 1, 8, 32
    model = S3D(num_classes=16)
    video = np.zeros((b, n, t, hw, hw, 3), np.float32)
    token = rng.randint(1, 50, (b, 6)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(video[0]))
    text_params = {
        "word_embd": rng.randn(50, 12).astype(np.float32),
        "fc1": {"kernel": rng.randn(12, 20).astype(np.float32),
                "bias": np.zeros(20, np.float32)},
        "fc2": {"kernel": rng.randn(20, 16).astype(np.float32),
                "bias": np.zeros(16, np.float32)},
    }
    params = {"s3d": variables["params"], "text": text_params}
    old = np.float32(1.0 + 1.0 / 512.0)  # rounds to 1.0 in bf16
    stats = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, old), variables["batch_stats"]
    )
    tx = optax.adamw(1e-4)
    mesh = make_mesh(8)
    step = make_s3d_nce_step(model, tx, mesh, freeze_early=False,
                             compute_dtype="bfloat16", train_bn=True)
    p = replicate(params, mesh)
    bs = replicate(stats, mesh)
    o = replicate(tx.init(params), mesh)
    batch = shard_batch({"video": video, "token": token}, mesh)
    _, bs2, _, metrics = step(p, bs, o, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    expect = 0.9 * float(old)  # 0.9017578125
    for leaf in jax.tree_util.tree_leaves(jax.device_get(bs2)):
        assert leaf.dtype == np.float32
        np.testing.assert_allclose(leaf, expect, rtol=0, atol=1e-6)


def test_htm_clip_dataset_grey_fallback():
    from exoground_tpu.data.video_clips import ClipConfig, HTMClipDataset

    class Tok:
        def __call__(self, t, **k):
            return {"input_ids": np.asarray([3, 4, 5], np.int32)}

    ds = HTMClipDataset(
        ClipConfig(video_root="/nonexistent", num_frames=8, crop_size=32,
                   scale_size=40),
        pairs=[{"vid": "v0", "text": "mix it", "start": 2.0, "end": 9.0}],
        tokenizer=Tok(),
    )
    item = ds[0]
    assert item["video"].shape == (1, 8, 32, 32, 3)
    # grey-frame fallback, no ffmpeg; default transfer dtype is uint8
    assert item["video"].dtype == np.uint8 and (item["video"] == 128).all()
    assert item["token"].shape == (16,)

    # clip_dtype="float32" reproduces the reference's host-side /255 path
    ds_f32 = HTMClipDataset(
        ClipConfig(video_root="/nonexistent", num_frames=8, crop_size=32,
                   scale_size=40, clip_dtype="float32"),
        pairs=[{"vid": "v0", "text": "mix it", "start": 2.0, "end": 9.0}],
        tokenizer=Tok(),
    )
    f = ds_f32[0]["video"]
    assert f.dtype == np.float32 and (f == 0.5).all()


def test_s3d_step_uint8_clips_match_float32():
    """uint8 device-side normalization == host f32/255: u8->f32 is an exact
    conversion, so the jitted step's /255 (train_step.py loss_fn) feeds the
    model the same values as decode_clip's host path. The loss matches
    exactly; updated params match to float rounding (XLA fuses the /255
    differently in the two programs, reassociating a ULP into the grads)."""
    import optax

    from exoground_tpu.parallel import make_mesh
    from exoground_tpu.parallel.train_step import make_s3d_nce_step

    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (4, 1, 8, 32, 32, 3)).astype(np.uint8)
    token = rng.randint(1, 50, (4, 6)).astype(np.int32)
    model = S3D(num_classes=16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(u8[0].astype(np.float32) / 255.0)
    )
    text_params = {
        "word_embd": rng.randn(50, 12).astype(np.float32),
        "fc1": {"kernel": rng.randn(12, 20).astype(np.float32),
                "bias": np.zeros(20, np.float32)},
        "fc2": {"kernel": rng.randn(20, 16).astype(np.float32),
                "bias": np.zeros(16, np.float32)},
    }
    tx = optax.adamw(1e-4)
    mesh = make_mesh(1)
    outs = {}
    for tag, video in (("u8", u8), ("f32", u8.astype(np.float32) / 255.0)):
        params = {"s3d": jax.device_get(variables["params"]),
                  "text": text_params}
        step = make_s3d_nce_step(model, tx, mesh, freeze_early=True)
        p, bs, st, m = step(
            params, jax.device_get(variables["batch_stats"]), tx.init(params),
            {"video": video, "token": token}, jax.random.PRNGKey(1),
        )
        outs[tag] = (float(m["loss"]), jax.device_get(p))
    assert outs["u8"][0] == outs["f32"][0]
    for a, b in zip(jax.tree_util.tree_leaves(outs["u8"][1]),
                    jax.tree_util.tree_leaves(outs["f32"][1])):
        # post-AdamW comparison: 1/(sqrt(v)+eps) amplifies a one-ULP grad
        # flip on near-zero grads to ~1e-4 relative on isolated elements
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)


def test_s3d_trainer_loop():
    from exoground_tpu.train import ExperimentConfig, S3DTrainer

    rng = np.random.RandomState(0)
    batch = {
        "video": rng.rand(8, 1, 8, 32, 32, 3).astype(np.float32),
        "token": rng.randint(1, 50, (8, 6)).astype(np.int32),
    }
    text_params = {
        "word_embd": rng.randn(50, 12).astype(np.float32),
        "fc1": {"kernel": rng.randn(12, 20).astype(np.float32),
                "bias": np.zeros(20, np.float32)},
        "fc2": {"kernel": rng.randn(20, 16).astype(np.float32),
                "bias": np.zeros(16, np.float32)},
    }
    cfg = ExperimentConfig(model="init", epochs=1, lr=1e-4, dp_devices=4,
                           gather_negatives=True)
    trainer = S3DTrainer(S3D(num_classes=16), cfg, batch, text_params,
                         iters_per_epoch=2)
    loss = trainer.train_epoch([batch, batch], epoch=0)
    assert np.isfinite(loss)
    assert trainer.iteration == 2
    trainer.close()

def test_s3d_trainer_loop_uint8_parity():
    """ADVICE r3 (high): the per-step trainer loop must keep uint8 clips
    uint8 (the jitted step normalizes /255 on device); the round-3 loop cast
    to float32 WITHOUT /255, silently training on [0,255]-scaled inputs.
    Trains one epoch from identical inits on a uint8 batch and on its exact
    float32 (/255) counterpart and asserts loss parity."""
    from exoground_tpu.train import ExperimentConfig, S3DTrainer

    rng = np.random.RandomState(2)
    u8 = rng.randint(0, 256, (8, 1, 8, 32, 32, 3)).astype(np.uint8)
    token = rng.randint(1, 50, (8, 6)).astype(np.int32)
    text_params = {
        "word_embd": rng.randn(50, 12).astype(np.float32),
        "fc1": {"kernel": rng.randn(12, 20).astype(np.float32),
                "bias": np.zeros(20, np.float32)},
        "fc2": {"kernel": rng.randn(20, 16).astype(np.float32),
                "bias": np.zeros(16, np.float32)},
    }
    # freezeBN: with trained BN stats XLA fuses the device /255 into the
    # batch-moment computation, reassociating a ULP (see
    # test_s3d_step_uint8_clips_match_float32); frozen stats make the two
    # programs bit-identical, so any host-side mis-scaling ([0,255] inputs)
    # fails loudly here
    cfg = ExperimentConfig(model="init", epochs=1, lr=1e-4, dp_devices=2,
                           freezeBN=True)
    losses = {}
    for tag, video in (("u8", u8), ("f32", u8.astype(np.float32) / 255.0)):
        batch = {"video": video, "token": token}
        tr = S3DTrainer(S3D(num_classes=16), cfg, batch, text_params,
                        iters_per_epoch=1)
        losses[tag] = tr.train_epoch([batch], epoch=0)
        tr.close()
    assert np.isfinite(losses["u8"])
    assert losses["u8"] == losses["f32"]


def test_s3d_trainer_checkpoints_batch_stats(tmp_path):
    """With the default train_bn (no --freezeBN) the BN running stats are
    learned state: they must survive a save/load round trip, or a resumed
    run re-normalizes with init-time statistics."""
    from exoground_tpu.train import ExperimentConfig, S3DTrainer

    rng = np.random.RandomState(1)
    batch = {
        "video": rng.rand(8, 1, 8, 32, 32, 3).astype(np.float32),
        "token": rng.randint(1, 50, (8, 6)).astype(np.int32),
    }
    text_params = {
        "word_embd": rng.randn(50, 12).astype(np.float32),
        "fc1": {"kernel": rng.randn(12, 20).astype(np.float32),
                "bias": np.zeros(20, np.float32)},
        "fc2": {"kernel": rng.randn(20, 16).astype(np.float32),
                "bias": np.zeros(16, np.float32)},
    }
    cfg = ExperimentConfig(model="init", epochs=1, lr=1e-4, dp_devices=2,
                           model_path=str(tmp_path))
    trainer = S3DTrainer(S3D(num_classes=16), cfg, batch, text_params,
                         iters_per_epoch=1)
    assert trainer.train_bn  # default: reference trains BN stats
    init_stats = jax.tree_util.tree_leaves(jax.device_get(trainer.batch_stats))
    trainer.train_epoch([batch], epoch=0)
    trained_stats = jax.device_get(trainer.batch_stats)
    # the step actually moved the running stats (otherwise this test is vacuous)
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(init_stats, jax.tree_util.tree_leaves(trained_stats))
    )
    assert moved
    trainer.save_epoch(0)
    trainer.close()

    fresh = S3DTrainer(S3D(num_classes=16), cfg, batch, text_params,
                       iters_per_epoch=1)
    fresh.load_checkpoint(str(tmp_path / "epoch0.pth.tar"), mode="resume")
    restored = jax.device_get(fresh.batch_stats)
    for a, b in zip(jax.tree_util.tree_leaves(trained_stats),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    fresh.close()

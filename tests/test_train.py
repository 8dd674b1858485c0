"""Trainer layer tests: config, checkpoints, optim policies, full train loops."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: run with -m slow

from exoground_tpu.data import FeatureStore, ThreadedLoader
from exoground_tpu.data.egoexo4d import EgoExo4DDataset, EgoExoConfig, EgoExoSource
from exoground_tpu.models import TemporalAligner
from exoground_tpu.models.grounding import ExoGroundingTransformer
from exoground_tpu.train import (
    EgoExoTrainer,
    ExperimentConfig,
    TANTrainer,
    clip_per_param_norm,
    latest_runtime_checkpoint,
    load_state,
    parse_args,
    restore_into,
    save_checkpoint,
    save_runtime_checkpoint,
    save_state,
    set_path,
)


# ----------------------------------------------------------------------- config
def test_parse_args_defaults_and_flags():
    cfg = parse_args([])
    assert cfg.model == "joint" and cfg.seq_len == 64
    cfg = parse_args(["--model", "grounding", "--lr", "0.001", "--use_audio",
                      "--iou_thresholds", "0.5", "0.7"])
    assert cfg.model == "grounding"
    assert cfg.lr == 0.001
    assert cfg.use_audio is True
    assert cfg.iou_thresholds == (0.5, 0.7)


def test_config_validation():
    with pytest.raises(AssertionError):
        ExperimentConfig(views="ego", use_distill_nce_loss=True).validate()
    with pytest.raises(AssertionError):
        ExperimentConfig(
            use_distill_nce_loss=True, use_pairwise_distill_nce_loss=True
        ).validate()


def test_config_model_dataset_routing():
    """--dataset htm-aa defaults the model to s3d only when --model was NOT
    passed; explicit mismatches raise instead of being silently rewritten,
    and s3d is rejected outside the e2e pipeline."""
    from exoground_tpu.train.config import parse_args

    assert parse_args(["--dataset", "htm-aa"]).model == "s3d"
    with pytest.raises(AssertionError):
        parse_args(["--dataset", "htm-aa", "--model", "joint"])
    with pytest.raises(AssertionError):
        parse_args(["--dataset", "htm-aa", "--model=joint"])
    with pytest.raises(AssertionError):
        parse_args(["--dataset", "egoexo4d", "--model", "s3d"])


def test_config_fps_resolution():
    """fps=None resolves per dataset at CONSTRUCTION (programmatic users
    never see None); explicit fps wins everywhere, including through
    parse_args' dataset override."""
    from exoground_tpu.train.config import parse_args

    assert ExperimentConfig().fps == 30
    assert ExperimentConfig(dataset="lemma").fps == 24
    assert ExperimentConfig(dataset="htm-aa", model="s3d").fps == 5
    assert ExperimentConfig(dataset="lemma", fps=30).fps == 30  # explicit wins
    assert parse_args([], dataset="lemma").fps == 24  # override re-resolves
    assert parse_args(["--fps", "30"], dataset="lemma").fps == 30


def test_set_path_registry(tmp_path):
    cfg = ExperimentConfig(model="grounding", dataset="egoexo4d")
    set_path(cfg, root=str(tmp_path))
    assert os.path.isdir(cfg.log_path) and os.path.isdir(cfg.model_path)
    assert "grounding" in cfg.exp_path and "len64" in cfg.exp_path
    cmd = open(os.path.join(cfg.log_path, "running_command.txt")).read()
    assert "command_time_stamp" in cmd
    # resume points back into the same experiment dir
    cfg2 = ExperimentConfig(
        resume=os.path.join(cfg.model_path, "epoch3.pth.tar")
    )
    set_path(cfg2, root=str(tmp_path))
    assert cfg2.exp_path == cfg.exp_path


# ------------------------------------------------------------------ checkpoints
def test_state_roundtrip(tmp_path):
    state = {
        "epoch": 3,
        "state_dict": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "iteration": 77,
    }
    p = str(tmp_path / "s.pth.tar")
    save_state(p, state)
    back = load_state(p)
    assert back["epoch"] == 3 and back["iteration"] == 77
    np.testing.assert_array_equal(back["state_dict"]["w"], state["state_dict"]["w"])


def test_save_checkpoint_prunes_previous_epoch(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    for ep in range(3):
        save_checkpoint(
            {"epoch": ep, "state_dict": {"w": np.zeros(2)}},
            filename=str(d / f"epoch{ep}.pth.tar"),
        )
    files = sorted(os.path.basename(f) for f in glob.glob(str(d / "epoch*")))
    assert files == ["epoch2.pth.tar"]  # previous pruned each time

    # keep_all preserves history
    for ep in range(3, 5):
        save_checkpoint(
            {"epoch": ep, "state_dict": {"w": np.zeros(2)}},
            filename=str(d / f"epoch{ep}.pth.tar"), keep_all=True,
        )
    files = sorted(os.path.basename(f) for f in glob.glob(str(d / "epoch*")))
    assert "epoch3.pth.tar" in files and "epoch4.pth.tar" in files


def test_runtime_checkpoint_keeps_latest_only(tmp_path):
    base = str(tmp_path / "runtime.pth.tar")
    for i in range(3):
        save_runtime_checkpoint({"iteration": i, "state_dict": {}}, base)
    snaps = glob.glob(str(tmp_path / "runtime_*.pth.tar"))
    assert len(snaps) == 1
    assert load_state(latest_runtime_checkpoint(base))["iteration"] == 2


def test_restore_into_nonstrict():
    template = {"a": np.zeros((2, 2), np.float32), "b": np.ones(3, np.float32)}
    src = {"a": np.full((2, 2), 7.0), "c": np.zeros(9)}
    out = restore_into(template, src)
    assert (out["a"] == 7).all()
    assert (out["b"] == 1).all()  # missing key keeps template value


# ------------------------------------------------------------------------ optim
def test_clip_per_param_norm():
    tx = clip_per_param_norm(1.0)
    grads = {"big": jnp.full((4,), 10.0), "small": jnp.full((4,), 0.01)}
    clipped, _ = tx.update(grads, tx.init(None))
    assert np.linalg.norm(clipped["big"]) == pytest.approx(1.0, rel=1e-4)
    np.testing.assert_allclose(clipped["small"], grads["small"])  # untouched


# ----------------------------------------------------------------- TAN trainer
def _tan_batches(b=8, t=12, n=4, d=24, num=3):
    rng = np.random.RandomState(0)
    out = []
    for i in range(num):
        start = rng.randint(0, t - 4, (b, n)).astype(np.float32)
        out.append({
            "video": rng.randn(b, t, d).astype(np.float32),
            "text": rng.randn(b, n, d).astype(np.float32),
            "video_padding_mask": np.zeros((b, t), bool),
            "text_padding_mask": np.zeros((b, n), bool),
            "start": start,
            "end": start + 3.0,
        })
    return out


def test_tan_trainer_end_to_end(tmp_path):
    cfg = ExperimentConfig(
        model="init", epochs=1, lr=1e-3, batch_size=8, seed=0,
        runtime_save_iter=2, dp_devices=8,
    )
    cfg.log_path = str(tmp_path / "log")
    cfg.model_path = str(tmp_path / "model")
    os.makedirs(cfg.log_path), os.makedirs(cfg.model_path)
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=32, attn_impl="xla",
    )
    batches = _tan_batches()
    trainer = TANTrainer(model, cfg, batches[0], iters_per_epoch=3)
    loss = trainer.train_epoch(batches, epoch=0)
    assert np.isfinite(loss)
    assert trainer.iteration == 3
    # runtime ckpt fired at iteration 2
    assert latest_runtime_checkpoint(
        os.path.join(cfg.model_path, "runtime.pth.tar")
    )
    val = trainer.evaluate(batches[:1], epoch=0)
    assert np.isfinite(val)
    trainer.save_epoch(0)
    ck = os.path.join(cfg.model_path, "epoch0.pth.tar")
    assert os.path.exists(ck)

    # resume restores iteration + params
    trainer2 = TANTrainer(model, cfg, batches[0], iters_per_epoch=3)
    trainer2.load_checkpoint(ck, mode="resume")
    assert trainer2.iteration == 3
    w1 = jax.device_get(trainer.params)
    w2 = jax.device_get(trainer2.params)
    leaves1 = jax.tree_util.tree_leaves(w1)
    leaves2 = jax.tree_util.tree_leaves(w2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    trainer.close(), trainer2.close()


def test_trainer_resume_across_optimizer_formats(tmp_path):
    """A checkpoint written under the optax chain resumes into the fused
    optimizer (and back) with Adam count/mu/nu carried over — NOT a silent
    warm-start with a restarted LR warmup (the --fused_optimizer default
    flipped between versions)."""
    batches = _tan_batches()
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=32, attn_impl="xla",
    )

    def _mk(fused, path):
        cfg = ExperimentConfig(
            model="init", epochs=1, lr=1e-3, batch_size=8, seed=0,
            dp_devices=8, fused_optimizer=fused,
        )
        cfg.model_path = str(path)
        os.makedirs(cfg.model_path, exist_ok=True)
        return TANTrainer(model, cfg, batches[0], iters_per_epoch=3)

    t1 = _mk(False, tmp_path / "optax")
    t1.train_epoch(batches, epoch=0)
    t1.save_epoch(0)
    ck = os.path.join(t1.cfg.model_path, "epoch0.pth.tar")

    t2 = _mk(True, tmp_path / "fused")
    from exoground_tpu.train.optim import FusedAdamWState

    assert isinstance(jax.device_get(t2.opt_state), FusedAdamWState)
    t2.load_checkpoint(ck, mode="resume")
    st = jax.device_get(t2.opt_state)
    assert int(st.count) == 3  # schedule position carried, not restarted
    assert any(  # moments carried, not zeroed
        float(np.abs(np.asarray(l)).max()) > 0
        for l in jax.tree_util.tree_leaves(st.mu)
    )

    # and the reverse direction: fused checkpoint into the optax chain
    t2.iteration = 3
    t2.save_epoch(1)
    ck2 = os.path.join(t2.cfg.model_path, "epoch1.pth.tar")
    t3 = _mk(False, tmp_path / "optax2")
    t3.load_checkpoint(ck2, mode="resume")
    from flax import serialization

    def find_adam(node):
        if isinstance(node, dict):
            if {"count", "mu", "nu"} <= set(node.keys()):
                return node
            for v in node.values():
                hit = find_adam(v)
                if hit is not None:
                    return hit
        return None

    adam = find_adam(serialization.to_state_dict(jax.device_get(t3.opt_state)))
    assert adam is not None and int(np.asarray(adam["count"])) == 3
    t1.close(), t2.close(), t3.close()


def test_tan_trainer_fused_steps(tmp_path):
    """--fused_steps 2: 3 batches -> one fused group of 2 + one single tail;
    iteration counting, meters and finite losses must match the protocol."""
    cfg = ExperimentConfig(
        model="init", epochs=1, lr=1e-3, batch_size=8, seed=0,
        dp_devices=8, fused_steps=2,
    )
    cfg.log_path = str(tmp_path / "log")
    cfg.model_path = str(tmp_path / "model")
    os.makedirs(cfg.log_path), os.makedirs(cfg.model_path)
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=32, attn_impl="xla",
    )
    batches = _tan_batches(num=3)
    trainer = TANTrainer(model, cfg, batches[0], iters_per_epoch=3)
    assert trainer.step_fused is not None
    loss = trainer.train_epoch(batches, epoch=0)
    assert np.isfinite(loss)
    assert trainer.iteration == 3
    # ragged group: mixed text counts can't stack -> the group falls back to
    # single steps; the epoch tail is a lone single step
    ragged = _tan_batches(n=5, num=1) + _tan_batches(num=2)
    loss = trainer.train_epoch(ragged, epoch=1)
    assert np.isfinite(loss)
    assert trainer.iteration == 6
    trainer.close()


def test_tan_trainer_cotrain_ema_moves(tmp_path):
    cfg = ExperimentConfig(
        model="cotrain", learn_agreement=1, temporal_agreement_type="keep",
        epochs=1, lr=1e-3, momentum_m=0.9, dp_devices=8,
    )
    model = TemporalAligner(
        num_encoder_layers=2, num_joint_layers=2, width=32, heads=4,
        max_pos=32, attn_impl="xla",
    )
    batches = _tan_batches(num=2)
    trainer = TANTrainer(model, cfg, batches[0], iters_per_epoch=2)
    t0 = jax.device_get(jax.tree_util.tree_leaves(trainer.target_params)[0]).copy()
    trainer.train_epoch(batches, epoch=0)
    t1 = jax.device_get(jax.tree_util.tree_leaves(trainer.target_params)[0])
    assert not np.allclose(t0, t1)  # EMA updated
    trainer.close()


# -------------------------------------------------------------- EgoExo trainer
def _egoexo_loader(tmp_path=None):
    rng = np.random.RandomState(1)
    cams = ["cam01", "cam02"]
    dur, c = 40, 24
    mem_v, mem_n = {}, {}
    split_rows, annotations, rankings, takes_cams = [], [], {}, {}
    for k in range(2):
        take, uid = f"t{k}", f"u{k}"
        split_rows.append({"take_name": take, "take_uid": uid,
                           "duration_sec": dur, "ego_cam": "aria01"})
        takes_cams[take] = [f"{cc}.mp4" for cc in cams]
        for cam in cams + ["aria01"]:
            mem_v[f"{take}_{cam}"] = rng.randn(dur, c).astype(np.float32)
        rankings[uid] = {
            str(t): {str(r): cams[(t + r) % 2] for r in range(2)}
            for t in range(dur)
        }
        for j in range(5):
            nid = f"n{k}_{j}"
            s = int(rng.randint(0, dur - 6))
            annotations.append({
                "video_id": take, "unique_narration_id": nid,
                "start_frame": s * 30, "end_frame": (s + 4) * 30,
                "narration": f"step {j}",
            })
            mem_n[f"{take}/{nid}"] = rng.randn(1, c).astype(np.float32)
    src = EgoExoSource(
        split_rows=split_rows, annotations=annotations,
        camera_rankings=rankings, takes_cams=takes_cams,
        video_store=FeatureStore(mem=mem_v),
        narration_store=FeatureStore(mem=mem_n),
    )
    dcfg = EgoExoConfig(
        duration=16, hop_length=8, views="exo", feature_dim=c,
        use_distill_nce_loss=True, same_view_negative=True, model="joint",
    )
    ds = EgoExo4DDataset(dcfg, src, split="train")
    loader = ThreadedLoader(ds, batch_size=8, num_workers=2, shuffle=True)
    return ds, loader, c


def test_egoexo_trainer_end_to_end(tmp_path):
    ds, loader, c = _egoexo_loader()
    cfg = ExperimentConfig(
        model="joint", use_distill_nce_loss=True, same_view_negative=True,
        epochs=1, lr=1e-3, dp_devices=8, views="exo",
    )
    cfg.log_path = str(tmp_path / "log")
    os.makedirs(cfg.log_path)
    model = ExoGroundingTransformer(
        num_encoder_layers=1, num_decoder_layers=1,
        video_embed_dim=c, text_embed_dim=c, feature_dim=32,
        use_distill_nce_loss=True, attn_impl="xla",
    )
    sample = next(iter(loader))
    trainer = EgoExoTrainer(model, cfg, sample, iters_per_epoch=len(loader))
    loss = trainer.train_epoch(loader, epoch=0)
    assert np.isfinite(loss)

    val_loss, results = trainer.evaluate(loader, epoch=0, test=True)
    assert np.isfinite(val_loss)
    assert "mean IoU" in results
    assert any(k.startswith("Rank ") for k in results), results.keys()
    res_files = glob.glob(os.path.join(cfg.log_path, "test_results_epoch_*.json"))
    assert res_files
    payload = json.load(open(res_files[0]))
    assert payload and "metadata" in payload[0]
    trainer.close()


def test_egoexo_trainer_fused_steps(tmp_path):
    ds, loader, c = _egoexo_loader()
    cfg = ExperimentConfig(
        model="joint", use_distill_nce_loss=True, same_view_negative=True,
        epochs=1, lr=1e-3, dp_devices=8, views="exo", fused_steps=2,
    )
    cfg.log_path = str(tmp_path / "log")
    os.makedirs(cfg.log_path)
    model = ExoGroundingTransformer(
        num_encoder_layers=1, num_decoder_layers=1,
        video_embed_dim=c, text_embed_dim=c, feature_dim=32,
        use_distill_nce_loss=True, attn_impl="xla",
    )
    sample = next(iter(loader))
    trainer = EgoExoTrainer(model, cfg, sample, iters_per_epoch=len(loader))
    assert trainer.step_fused is not None
    loss = trainer.train_epoch(loader, epoch=0)
    assert np.isfinite(loss)
    assert trainer.iteration == len(loader)
    trainer.close()


def test_small_utils():
    from exoground_tpu.train.checkpoint import MODEL_CARDS, get_model_card
    from exoground_tpu.utils.meters import (
        ConfusionMeter,
        calc_topk_accuracy,
        get_youtube_link,
        second_to_time,
    )

    scores = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    top1, top2 = calc_topk_accuracy(scores, [1, 0, 1], topk=(1, 2))
    assert top1 == pytest.approx(2 / 3)
    assert top2 == pytest.approx(1.0)

    cm = ConfusionMeter(2)
    cm.update([0, 1, 1], [0, 1, 0])
    assert cm.mat[1][1] == 1 and cm.mat[1][0] == 1
    assert cm.precision()[0] == 1.0

    assert second_to_time([125, 61]) == ["02:05", "01:01"]
    assert get_youtube_link([5, 10], ["abc", "def"]) == [
        "https://www.youtube.com/watch?v=abc&t=5s",
        "https://www.youtube.com/watch?v=def&t=10s",
    ]
    MODEL_CARDS["tiny"] = "/x/y.pth.tar"
    assert get_model_card("tiny") == "/x/y.pth.tar"
    assert get_model_card("/z.pth.tar") == "/z.pth.tar"


def test_orbax_checkpoint_backend(tmp_path):
    """Orbax directory checkpoints round-trip the same semantic fields;
    load_state auto-detects directories as orbax."""
    from exoground_tpu.train.checkpoint import (
        load_state,
        save_state,
        save_state_orbax,
    )

    state = {"epoch": 3, "iteration": 120, "best_acc": 0.5,
             "state_dict": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    p = str(tmp_path / "ckpt_orbax")
    save_state_orbax(p, state)
    back = load_state(p)
    assert back["epoch"] == 3 and back["iteration"] == 120
    np.testing.assert_allclose(back["state_dict"]["w"], state["state_dict"]["w"])
    p2 = str(tmp_path / "ckpt.pth.tar")
    save_state(p2, state)
    np.testing.assert_allclose(
        load_state(p2)["state_dict"]["w"], state["state_dict"]["w"]
    )

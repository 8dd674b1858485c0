"""CLI end-to-end: python -m exoground_tpu.train.main on synthetic data trees."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: run with -m slow


def _make_htm_root(tmp_path, n_vids=12, vlen=160, dim=32):
    rng = np.random.RandomState(0)
    root = tmp_path / "htm"
    feat = root / "howto100m_s3d_features"
    feat.mkdir(parents=True)
    asr = {}
    align = {}
    for i in range(n_vids):
        vid = f"v{i:02d}"
        np.save(str(feat / f"{vid}.mp4.npy"), rng.randn(vlen, dim).astype(np.float32))
        starts = np.sort(rng.rand(10) * (vlen - 20)).tolist()
        asr[vid] = {
            "text": [f"now we do the step number {j} here" for j in range(10)],
            "start": starts,
            "end": [s + 4 for s in starts],
        }
        align[vid] = [
            [1, 5.0, 12.0, "wash the vegetables"],
            [0, 30.0, 40.0, "umm so yeah anyway"],
            [1, 80.0, 95.0, "chop the onions"],
        ]
    with open(root / "sentencified_htm_370k.json", "w") as f:
        json.dump(asr, f)
    with open(root / "htm_align.json", "w") as f:
        json.dump(align, f)

    # word2vec tower as a torch checkpoint with the MIL-NCE key layout
    import torch

    words = np.array([f"word{i}" for i in range(200)])
    np.save(str(root / "s3d_dict.npy"), words)
    state = {
        "text_module.word_embd.weight": torch.randn(201, 16),
        "text_module.fc1.weight": torch.randn(24, 16),
        "text_module.fc1.bias": torch.zeros(24),
        "text_module.fc2.weight": torch.randn(512, 24),
        "text_module.fc2.bias": torch.zeros(512),
    }
    torch.save({"state_dict": state}, str(root / "s3d_howto100m.pth"))
    return str(root)


def test_cli_htm_tan_train(tmp_path, monkeypatch):
    from exoground_tpu.train.main import main

    root = _make_htm_root(tmp_path)
    monkeypatch.chdir(tmp_path)  # set_path writes log<prefix>/ under cwd
    best = main([
        "--dataset", "htm-370k",
        "--model", "init",
        "--data_root", root,
        "--seq_len", "32",
        "--batch_size", "8",
        "--epochs", "1",
        "--num_workers", "2",
        "--num_encoder_layers", "1",
        "--num_decoder_layers", "1",
        "--hidden_dim", "64",
        "--attn_impl", "xla",
        "--eval_freq", "1",
    ])
    assert np.isfinite(best)
    # experiment registry materialized under cwd's log/ tree
    import glob

    found = glob.glob("log/**/running_command.txt", recursive=True)
    assert found
    # an epoch checkpoint was written next to it
    ckpts = glob.glob("log/**/epoch0.pth.tar", recursive=True) + glob.glob(
        "log/**/model/epoch0.pth.tar", recursive=True
    )
    assert ckpts


def _make_egoexo_root(tmp_path, n_takes=2, dur=50, c=24):
    import pandas as pd
    import torch

    rng = np.random.RandomState(1)
    root = tmp_path / "egoexo"
    (root / "splits").mkdir(parents=True)
    (root / "narration_annotations").mkdir()
    vf = root / "egovlpv2_video_features"
    vf.mkdir()
    nf = root / "narration_features"
    nf.mkdir()
    cams = ["cam01", "cam02"]
    split_rows, annos, rankings, takes = [], [], {}, []
    for k in range(n_takes):
        take, uid = f"take{k}", f"uid{k}"
        split_rows.append({
            "take_name": take, "take_uid": uid, "duration_sec": dur,
            "ego_camera_path": f"/x/{take}/aria01.mp4",
        })
        takes.append({
            "take_name": take,
            "frame_aligned_videos": {f"{cc}.mp4": {} for cc in cams},
        })
        for cam in cams + ["aria01"]:
            torch.save(torch.randn(dur, c), str(vf / f"{take}_{cam}.pt"))
        rankings[uid] = {
            str(t): {str(r): cams[(t + r) % 2] for r in range(2)}
            for t in range(dur)
        }
        (nf / take).mkdir()
        for j in range(5):
            nid = f"n{k}_{j}"
            s = int(rng.randint(0, dur - 6))
            annos.append({
                "take_uid": take, "unique_narration_id": nid,
                "start_frame": s * 30, "end_frame": (s + 4) * 30,
                "narration": f"does step {j}",
            })
            torch.save(torch.randn(1, c), str(nf / take / f"{nid}.pt"))
    for split in ("train", "val"):
        pd.DataFrame(split_rows).to_csv(str(root / "splits" / f"{split}.csv"),
                                        index=False)
        pd.DataFrame(annos).to_csv(
            str(root / "narration_annotations" / f"{split}.csv"), index=False
        )
    import json as _json

    with open(root / "all_camera_rankings.json", "w") as f:
        _json.dump(rankings, f)
    with open(root / "takes.json", "w") as f:
        _json.dump(takes, f)
    return str(root), c


def test_cli_egoexo_joint_train(tmp_path, monkeypatch):
    from exoground_tpu.train.main import main

    root, c = _make_egoexo_root(tmp_path)
    monkeypatch.chdir(tmp_path)
    best = main([
        "--dataset", "egoexo4d",
        "--model", "joint",
        "--data_root", root,
        "--seq_len", "16",
        "--seq_hop", "8",
        "--batch_size", "8",
        "--epochs", "1",
        "--num_workers", "2",
        "--num_encoder_layers", "1",
        "--num_decoder_layers", "1",
        "--feature_dim", "32",
        "--video_feature_dim", str(c),
        "--text_feature_dim", str(c),
        "--views", "exo",
        "--use_distill_nce_loss",
        "--attn_impl", "xla",
    ])
    assert np.isfinite(best)
    # windows CSV cache materialized in the data root
    import glob

    assert glob.glob(os.path.join(root, "*windows.csv"))


def test_launch_scripts_flag_surface():
    """scripts/*.sh mirror the reference train/*.sh flag surfaces; every flag
    they pass must parse and validate against our CLI."""
    import re

    from exoground_tpu.train.config import parse_args

    root = os.path.join(os.path.dirname(__file__), "..", "scripts")
    cases = 0
    for name in sorted(os.listdir(root)):
        if not name.endswith(".sh") or name == "launch_tpu_pod.sh":
            continue
        text = open(os.path.join(root, name)).read()
        m = re.search(r"train\.main \\\n(.*)", text, re.S)
        assert m, name
        flags = []
        for line in m.group(1).splitlines():
            line = line.strip().rstrip("\\").strip()
            if not line or line.startswith("#"):
                continue
            for tok in line.split():
                if tok.startswith('"$') or tok == '"$@"':
                    tok = {"\"$PREFIX\"": "x", "\"$VI\"": "/tmp/vi.pth.tar",
                           "\"$CKPT\"": "/tmp/ckpt.pth.tar", "\"$MODEL\"": "init",
                           "\"$AGREE\"": "0",
                           }.get(tok, None)
                    if tok is None:
                        continue
                flags.append(tok)
        cfg = parse_args(flags)
        if hasattr(cfg, "validate"):
            cfg.validate()
        cases += 1
    assert cases >= 5


def _make_htm_aa_root(tmp_path):
    """Synthetic HTM-AA tree: csv rows + text-tower-only checkpoint; no
    videos/ dir so decode rides the grey-frame fallback
    (video_loader.py:164-166)."""
    import pandas as pd
    import torch

    root = tmp_path / "htm_aa"
    root.mkdir()
    rows = []
    for i in range(8):
        rows.append({
            "vid": f"v{i:02d}", "timestamp": 30 + 5 * i,
            "text": f"now we knead the dough number {i}",
        })
    pd.DataFrame(rows).to_csv(str(root / "htm_aa_v1.csv"), index=False)
    pd.DataFrame(
        {"vid": [f"v{i:02d}" for i in range(8)], "vlen": [300] * 8}
    ).to_csv(str(root / "htm_vlen.csv"), index=False)
    words = np.array([f"word{i}" for i in range(200)])
    np.save(str(root / "s3d_dict.npy"), words)
    state = {
        "text_module.word_embd.weight": torch.randn(201, 16),
        "text_module.fc1.weight": torch.randn(24, 16),
        "text_module.fc1.bias": torch.zeros(24),
        "text_module.fc2.weight": torch.randn(16, 24),
        "text_module.fc2.bias": torch.zeros(16),
    }
    torch.save({"state_dict": state}, str(root / "s3d_howto100m.pth"))
    return str(root)


@pytest.mark.slow
def test_cli_htm_e2e_train(tmp_path, monkeypatch):
    """--dataset htm-aa route (reference end2end/main_nce.py:275-403): full
    S3D + text tower, 1 epoch on grey-fallback clips, BN stats update in the
    default (non-freezeBN) mode, checkpoint written."""
    from exoground_tpu.train.main import main

    root = _make_htm_aa_root(tmp_path)
    monkeypatch.chdir(tmp_path)
    last_loss = main([
        "--dataset", "htm-aa",
        "--data_root", root,
        "--batch_size", "8",
        "--epochs", "1",
        "--num_workers", "2",
        "--num_frames", "4",
        "--no-pt_backbone",          # fake ckpt carries only the text tower
        "--lr_backbone", "1e-6",
        "--runtime_save_iter", "1000000",
    ])
    assert np.isfinite(last_loss)
    import glob

    assert glob.glob("log/**/model/epoch0.pth.tar", recursive=True)
    # fps default resolved per dataset: htm-aa decodes at 5 fps
    from exoground_tpu.train.config import parse_args

    cfg = parse_args(["--dataset", "htm-aa"])
    assert cfg.fps == 5 and cfg.model == "s3d"
    assert parse_args(["--dataset", "lemma", "--model", "joint"]).fps == 24
    # explicit --fps always wins (used to be silently rewritten for lemma)
    assert parse_args(
        ["--dataset", "lemma", "--model", "joint", "--fps", "30"]
    ).fps == 30


def test_s3d_train_bn_updates_stats(tmp_path):
    """freezeBN=False (the reference default) must move BN running stats;
    freezeBN=True must not (end2end/freeze_bn.py semantics)."""
    import jax

    from exoground_tpu.train.config import parse_args
    from exoground_tpu.train.trainer import S3DTrainer
    from exoground_tpu.models.s3d import S3D

    rng = np.random.RandomState(0)
    sample = {
        "video": rng.rand(4, 1, 4, 32, 32, 3).astype(np.float32),
        "token": rng.randint(1, 50, (4, 6)).astype(np.int32),
    }
    text_params = {
        "word_embd": rng.randn(50, 12).astype(np.float32),
        "fc1": {"kernel": rng.randn(12, 20).astype(np.float32),
                "bias": np.zeros(20, np.float32)},
        "fc2": {"kernel": rng.randn(20, 16).astype(np.float32),
                "bias": np.zeros(16, np.float32)},
    }

    def one_step(freeze):
        argv = ["--dataset", "htm-aa", "--model", "s3d", "--epochs", "1",
                "--batch_size", "4", "--lr_backbone", "1e-6",
                "--dp_devices", "4"]  # batch 4 must divide the mesh
        if freeze:
            argv.append("--freezeBN")
        cfg = parse_args(argv)
        tr = S3DTrainer(S3D(num_classes=16), cfg, sample, text_params,
                        iters_per_epoch=1)
        before = jax.device_get(tr.batch_stats)
        tr.train_epoch([sample], epoch=0)
        after = jax.device_get(tr.batch_stats)
        diffs = [
            float(np.abs(a - b).max())
            for a, b in zip(jax.tree_util.tree_leaves(before),
                            jax.tree_util.tree_leaves(after))
        ]
        return max(diffs)

    assert one_step(freeze=True) == 0.0
    assert one_step(freeze=False) > 0.0


def test_parse_args_rejects_flag_abbreviations():
    """Prefix abbreviations would bypass the literal '--model' argv scan
    (e.g. '--mode joint' resolving to --model and then being silently
    rewritten to s3d for htm-aa) — they must be argparse errors."""
    from exoground_tpu.train.config import parse_args

    with pytest.raises(SystemExit):
        parse_args(["--dataset", "htm-aa", "--mode", "joint"])
    # the full flag still reaches validate() and raises there
    with pytest.raises(AssertionError, match="htm-aa trains the S3D"):
        parse_args(["--dataset", "htm-aa", "--model", "joint"])

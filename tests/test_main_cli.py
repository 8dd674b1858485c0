"""CLI end-to-end: python -m exoground_tpu.train.main on synthetic data trees."""

import json
import os

import numpy as np
import pytest


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

"""Deterministic synthetic YouCook2 world, shared by the reference oracle
parity test (tests/test_oracle_yc2_loader.py) and the self-contained
data-layer golden fixtures. Fully deterministic — frozen items compare
positionally. Our loader consumes the in-memory features, so the golden test
needs no torch; the on-disk .pth.tar files exist only for the reference."""

import numpy as np

VDIM = 6

# segments chosen to hit BOTH adaptive branches: short segments
# (chosen_vlen = clip(2*dur, 32, 256) >= dur -> covering windows) and a
# very long one (dur > 256 -> windows inside the segment)
ANNO = {
    "vidA": {"annotations": [
        # ints: the youcookii json stores integer seconds and the reference
        # indexes with them unconverted
        {"segment": [5, 17], "sentence": "add the flour"},
        {"segment": [40, 350], "sentence": "long baking montage"},
    ]},
    "vidB": {"annotations": [
        {"segment": [2, 60], "sentence": "mix everything"},
    ]},
}
VLENS = {"vidA": 400, "vidB": 90}

# (num_clips, seq_len) configs frozen into the golden fixture
GOLDEN_CONFIGS = {
    "c10_adaptive": (10, -1),  # the eval protocol config (test_retrieval_yc2:162)
    "c4_adaptive": (4, -1),
    "c4_fixed32": (4, 32),  # fixed-window mode
}


def build_yc2_world(root=None):
    """Synthetic features (+ reference-side .pth.tar files when ``root`` is
    given — only the reference loader reads from disk)."""
    r = np.random.RandomState(13)
    feats, vid2path = {}, {}
    for vid, vlen in VLENS.items():
        feats[vid] = r.randn(vlen, VDIM).astype(np.float32)
        vid2path[vid] = f"x/{vid}/file"
        if root is not None:
            import torch

            d = root / "src" / vid
            d.mkdir(parents=True)
            torch.save(torch.from_numpy(feats[vid]),
                       root / f"{vid}_{vid}.pth.tar")
    return {"root": str(root) if root is not None else None, "anno": ANNO,
            "vlens": VLENS, "feats": feats, "vid2path": vid2path}


def make_our_loader(world, num_clips, seq_len):
    from exoground_tpu.data.io import FeatureStore
    from exoground_tpu.data.youcook2 import YouCook2Config, YouCook2Dataset

    return YouCook2Dataset(
        YouCook2Config(num_clips=num_clips, seq_len=seq_len),
        FeatureStore(mem=world["feats"]),
        world["anno"],
        half_val=False,  # the reference eval class has no half split
    )

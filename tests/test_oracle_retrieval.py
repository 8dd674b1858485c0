"""Protocol parity for YouCook2 zero-shot retrieval.

Runs the reference's ACTUAL ``test_retrieval_yc2`` (torch, imported from
/root/reference/eval/eval_zeroshot_retrieval.py:156-256) against our
``evals/retrieval.py::test_retrieval_yc2`` on identical synthetic items,
with both sides' towers computing through shared float32 numpy primitives.
Only the disk-backed ``YouCook2_Feature`` dataset is stubbed — the
reference's clip trimming, norm-then-mean pooling, 4-dim stage selection,
interpolate_from gating, and raw/centered/standardized metric math all
execute as-is.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
REF_EVAL = os.path.join(REF_ROOT, "eval", "eval_zeroshot_retrieval.py")

pytestmark = [
    pytest.mark.slow,  # integration tier: run with -m slow
    pytest.mark.skipif(not os.path.isfile(REF_EVAL),
                       reason="reference not mounted"),
]

# world + visual primitive live in golden_common so the self-contained
# golden protocol fixture freezes EXACTLY this world
from tests import golden_common as G

SEQ_LEN = G.YC2_SEQ_LEN
_make_items = G.yc2_protocol_items
_vis_primitive = G.yc2_vis_primitive


def _load_ref_mod():
    sys.path.insert(0, REF_ROOT)
    try:
        spec = importlib.util.spec_from_file_location("ref_eval_yc2", REF_EVAL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_ROOT)
    return mod


@pytest.fixture(scope="module")
def ref_mod():
    return _load_ref_mod()


def _run_reference_yc2(ref_mod, items, table, w_vis, w_txt):
    """Drive the reference loop on the synthetic world (torch side). Used by
    the parity test below AND frozen into tests/golden/retrieval_protocol.npz
    by the fixture generator."""
    import torch

    class FakeYC2(torch.utils.data.Dataset):
        def __init__(self, mode=None, num_clips=10, seq_len=-1, source=None):
            pass

        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            it = items[i]
            return {
                "video": torch.from_numpy(it["video"]),
                "start_idx": torch.from_numpy(it["start_idx"]),
                "end_idx": torch.from_numpy(it["end_idx"]),
                "start": it["start"], "end": it["end"],
                "str": it["str"], "vid": it["vid"],
            }

    ref_mod.YouCook2_Feature = FakeYC2

    def get_visual_feature(video, mask, interpolate_from=None):
        out = _vis_primitive(video.cpu().numpy(), w_vis,
                             interpolate_from is not None)
        return torch.from_numpy(out)

    def tokenizer(texts, return_tensors=None, padding=None):
        emb = np.stack([table[t] for t in texts]).astype(np.float32)
        return {"emb": torch.from_numpy(emb)}

    def lang_model(emb):
        return {"pooler_output": emb}

    def get_text_feature(lang_embed):
        return torch.from_numpy(
            lang_embed.cpu().numpy().astype(np.float32) @ w_txt
        )

    args = types.SimpleNamespace(
        tokenizer=tokenizer, seq_len=SEQ_LEN, sim="cos", num_workers=0
    )
    return ref_mod.test_retrieval_yc2(
        lang_model, get_visual_feature, get_text_feature, "cpu", args
    )


def test_yc2_protocol_matches_reference(ref_mod):
    items, table, w_vis, w_txt = _make_items()
    ref = _run_reference_yc2(ref_mod, items, table, w_vis, w_txt)
    got = G.yc2_run_ours(items, w_vis, w_txt)

    for k in G.YC2_METRIC_KEYS:
        np.testing.assert_allclose(
            got[k], float(ref[k]), atol=1e-9, err_msg=k
        )

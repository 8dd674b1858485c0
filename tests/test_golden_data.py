"""Self-contained data-layer regression against committed golden fixtures.

Like tests/test_golden.py but for the data loaders: the fixtures freeze the
REFERENCE loader classes' items over the deterministic synthetic worlds
(tests/world_egoexo.py), generated once by
exoground_tpu/tools/gen_golden_fixtures.py. Protocol drift in
data/egoexo4d.py (window precompute, feature slicing, rank targets,
multi-view stitching, center/duration labels, ...) fails here WITHOUT
/root/reference mounted. torch/pandas are needed only to materialize the
synthetic world's .pt feature files — both are baked into the environment.

Reference row order is filesystem-dependent (precompute listdirs), so items
are matched by window key exactly like the oracle tests do.
"""

import os

import numpy as np
import pytest

from tests import golden_common as G
from tests import world_egoexo as W

pytestmark = [
    pytest.mark.slow,  # integration tier (world build + torch import)
    pytest.mark.skipif(
        not os.path.isfile(os.path.join(G.GOLDEN_DIR, "egoexo_loader.npz")),
        reason="golden fixtures not generated",
    ),
]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    return W.build_egoexo_world(tmp_path_factory.mktemp("egoexo_golden"))


@pytest.fixture(scope="module")
def fixture():
    return np.load(os.path.join(G.GOLDEN_DIR, "egoexo_loader.npz"))


def _positions_by_key(stored_keys):
    by_key = {}
    for pos, k in enumerate(stored_keys):
        by_key.setdefault(str(k), []).append(pos)
    return by_key


@pytest.mark.parametrize("tag", sorted(W.GOLDEN_CONFIGS))
def test_golden_egoexo_items(world, fixture, tag):
    z = fixture
    ours = W.make_our_loader(world, **dict(W.GOLDEN_CONFIGS[tag]))
    our_keys = ["|".join(map(str, W.window_key(w))) for w in ours.windows]
    stored = [str(k) for k in z[f"{tag}::keys"]]
    assert sorted(our_keys) == sorted(stored), f"{tag}: window multiset"

    by_key = _positions_by_key(stored)
    fields = set(z.files)
    for i, key in enumerate(our_keys):
        pos = by_key[key].pop(0)
        item = ours[i]
        kid = f"{tag}::{pos}"
        for k in W.COMPARE_KEYS:
            fid = f"{kid}::{k}"
            if fid in fields:
                assert k in item, f"{fid}: missing in ours"
                np.testing.assert_allclose(
                    np.asarray(item[k], np.float64),
                    z[fid].astype(np.float64), atol=1e-6, err_msg=fid,
                )
            else:
                assert k not in item, f"{fid}: extra in ours"
        md = item["metadata"]
        for k in W.META_KEYS:
            got = [str(x) for x in np.atleast_1d(md[k])]
            want = [str(x) for x in z[f"{kid}::meta.{k}"]]
            assert got == want, f"{kid}: metadata.{k}"
        assert int(md["start_sec"]) == int(z[f"{kid}::meta.start_sec"]), kid


def test_golden_egoexo_tan_items(world, fixture):
    z = fixture
    ours = W.make_our_tan_loader(world)
    our_keys = ["|".join(map(str, W.window_key(w))) for w in ours.windows]
    stored = [str(k) for k in z["tan::keys"]]
    assert sorted(our_keys) == sorted(stored)

    by_key = _positions_by_key(stored)
    for i, key in enumerate(our_keys):
        pos = by_key[key].pop(0)
        item = ours[i]
        kid = f"tan::{pos}"
        for k in ("video", "padding_mask", "narration_features",
                  "narration_padding_mask", "start", "end"):
            np.testing.assert_allclose(
                np.asarray(item[k], np.float64),
                z[f"{kid}::{k}"].astype(np.float64), atol=1e-6,
                err_msg=f"{kid}::{k}",
            )
        got = [str(x) for x in item["metadata"]["narrations"]]
        want = [str(x) for x in z[f"{kid}::meta.narrations"]]
        assert got == want, kid

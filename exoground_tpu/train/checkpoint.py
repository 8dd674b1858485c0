"""Checkpoint save/resume with the reference's lifecycle semantics.

Format: one msgpack file (flax.serialization) holding
{epoch, state_dict, best_acc, optimizer, iteration[, target_state_dict]} —
the reference's dict fields (train/main.py:532-537). Lifecycle parity with
utils/utils.py:23-57:
  * save_checkpoint: writes epoch%d.pth.tar, deletes the previous epoch file
    unless keep_all, maintains the 2 best as model_best_epoch%d.pth.tar
  * save_runtime_checkpoint: timestamped runtime snapshot keeping only the
    newest (crash recovery every runtime_save_iter iterations)
  * load modes: resume (continue), pretrain (init-from, non-strict),
    test (eval only) — main_egoexo4d_distributed.py:731-779
"""

from __future__ import annotations

import glob
import os
import re
from datetime import datetime
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_state(path: str, state: Dict[str, Any]) -> None:
    # to_state_dict converts tuples/namedtuples (optax states) to nested dicts
    # that msgpack can hold; arrays come back as numpy on load
    blob = serialization.msgpack_serialize(
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x,
            serialization.to_state_dict(state),
        )
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_state(path: str) -> Dict[str, Any]:
    if os.path.isdir(path):  # orbax checkpoints are directories
        return load_state_orbax(path)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_state_orbax(path: str, state: Dict[str, Any]) -> None:
    """Orbax backend (same semantic fields as the msgpack format).

    Orbax is the JAX ecosystem's standard checkpointing library: sharded /
    async / multihost-aware saves for users integrating this framework into
    an existing orbax-managed training stack. The msgpack format stays the
    default (single-file, reference-lifecycle parity)."""
    import orbax.checkpoint as ocp

    blob = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x,
        serialization.to_state_dict(state),
    )
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), blob, force=True)


def load_state_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def save_checkpoint(
    state: Dict[str, Any],
    is_best: bool = False,
    gap: int = 1,
    filename: str = "model/epoch0.pth.tar",
    keep_all: bool = False,
    save_best_n: int = 2,
) -> None:
    """Reference utils/utils.py:39-57: prune the previous epoch's file unless
    keep_all; on is_best write model_best_epoch*.pth.tar keeping the newest
    ``save_best_n``."""
    save_state(filename, state)
    m = re.search(r"epoch(\d+)", os.path.basename(filename))
    if m and not keep_all:
        last = os.path.join(
            os.path.dirname(filename), f"epoch{int(m.group(1)) - gap}.pth.tar"
        )
        if os.path.exists(last):
            os.remove(last)
    if is_best:
        best_path = os.path.join(
            os.path.dirname(filename),
            f"model_best_epoch{state.get('epoch', 0)}.pth.tar",
        )
        save_state(best_path, state)
        past_best = sorted(
            glob.glob(os.path.join(os.path.dirname(filename),
                                   "model_best_*.pth.tar")),
            key=os.path.getmtime,
        )
        for p in past_best[:-save_best_n]:
            os.remove(p)


def save_runtime_checkpoint(
    state: Dict[str, Any], filename: str, rm_history: bool = True
) -> None:
    """Timestamped snapshot keeping only the newest (utils/utils.py:23-36)."""
    assert filename.endswith(".pth.tar")
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    out = filename.replace(".pth.tar", f"_{ts}.pth.tar")
    save_state(out, state)
    if rm_history:
        history = sorted(
            glob.glob(filename.replace(".pth.tar", "_*.pth.tar")),
            key=os.path.getmtime,
        )
        for p in history[:-1]:
            os.remove(p)


def latest_runtime_checkpoint(filename: str) -> Optional[str]:
    history = sorted(
        glob.glob(filename.replace(".pth.tar", "_*.pth.tar")),
        key=os.path.getmtime,
    )
    return history[-1] if history else None


def restore_into(template, state_dict):
    """Non-strict structured restore (reference neq_load_customized,
    utils/utils.py:302-312): keys present in both are loaded; missing/extra
    keys are reported, shapes must match where present."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    tpl_paths = {jax.tree_util.keystr(k): k for k in flat_t}
    flat_s = dict(jax.tree_util.tree_flatten_with_path(state_dict)[0])
    src_by_str = {jax.tree_util.keystr(k): v for k, v in flat_s.items()}
    missing, loaded = [], {}
    for kstr, key in tpl_paths.items():
        if kstr in src_by_str and src_by_str[kstr].shape == flat_t[key].shape:
            loaded[key] = np.asarray(src_by_str[kstr], flat_t[key].dtype)
        else:
            missing.append(kstr)
            loaded[key] = flat_t[key]
    extra = [k for k in src_by_str if k not in tpl_paths]
    if missing:
        print(f"[checkpoint] {len(missing)} params NOT restored: {missing[:8]}...")
    if extra:
        print(f"[checkpoint] {len(extra)} checkpoint keys unused: {extra[:8]}...")
    leaves = [loaded[k] for k in flat_t.keys()]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# checkpoint alias registry (reference train/main.py:547-552): short tags map
# to checkpoint paths so CLIs can say --pretrain <tag>
MODEL_CARDS: Dict[str, str] = {}


def get_model_card(tag: str) -> str:
    if tag in MODEL_CARDS:
        print(f"[checkpoint] model card {tag} -> {MODEL_CARDS[tag]}")
    return MODEL_CARDS.get(tag, tag)

"""Checkpointing with resume — fixes the reference's save-only gap
(reference train.py:271-273 saves model weights every 500 steps but never
optimizer/scheduler state and has no restore path).

Uses orbax-checkpoint when available (async-friendly, multi-host safe),
with a numpy .npz fallback. A checkpoint holds the FULL train state:
params (incl. BN running stats), optimizer state, and step counter.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "shape"):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(ckpt_dir: str, state: Dict[str, Any], step: int,
                    keep: int = 5) -> str:
    """Save full train state; prunes old checkpoints beyond `keep`."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}")
    try:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), jax.device_get(state))
    except Exception:
        flat = _flatten(jax.device_get(state))
        np.savez(path + ".npz", **flat)
        path = path + ".npz"
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int):
    ckpts = sorted(_list_ckpts(ckpt_dir))
    for _, p in ckpts[:-keep]:
        try:
            if p.endswith(".npz"):
                os.remove(p)
            else:
                import shutil
                shutil.rmtree(p)
        except OSError:
            pass


def _list_ckpts(ckpt_dir: str):
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        m = re.match(r"ckpt_(\d+)(\.npz)?$", name)
        if m:
            out.append((int(m.group(1)), os.path.join(ckpt_dir, name)))
    return out


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = sorted(_list_ckpts(ckpt_dir))
    return ckpts[-1][1] if ckpts else None


def restore_checkpoint(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of `target` (an abstract or concrete train
    state pytree)."""
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=True))
        leaves, treedef = jax.tree.flatten(target)
        flat_target = _flatten(target)
        assert set(flat) == set(flat_target), "checkpoint/state key mismatch"
        restored_flat = {k: flat[k] for k in flat_target}
        # rebuild in target order
        new_leaves = []
        for key, leaf in zip(_flatten_keys(target), leaves):
            new_leaves.append(restored_flat[key].astype(
                np.asarray(leaf).dtype) if hasattr(leaf, "dtype")
                else restored_flat[key])
        return jax.tree.unflatten(treedef, new_leaves)
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)


def _flatten_keys(tree, prefix=""):
    keys = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            keys.extend(_flatten_keys(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "shape"):
        for i, v in enumerate(tree):
            keys.extend(_flatten_keys(v, f"{prefix}{i}/"))
    else:
        keys.append(prefix[:-1])
    return keys


def load_params_from_checkpoint(ckpt_dir_or_path: str):
    """Extract the model params pytree from a training checkpoint, for
    handing to the inference engine (XFeat(weights=params))."""
    path = ckpt_dir_or_path
    if os.path.isdir(path) and latest_checkpoint(path):
        path = latest_checkpoint(path)
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=True))
        params_flat = {k[len("params/"):]: v for k, v in flat.items()
                       if k.startswith("params/")}
        from ..api import _unflatten
        return _unflatten({k: v for k, v in params_flat.items()})
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path))
    return state["params"]


def resume_or_init(ckpt_dir: str, init_state: Dict[str, Any]):
    """Resume from the latest checkpoint if present, else return
    `init_state`. Returns (state, resumed: bool)."""
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return init_state, False
    return restore_checkpoint(path, init_state), True

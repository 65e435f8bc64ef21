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


def _name_alias_map(tree, prefix="", nprefix=""):
    """{name-variant path: canonical positional path} for every leaf,
    where namedtuple levels (optax states) also key by field name —
    lets restore_checkpoint accept exports that flattened namedtuples
    by field ('opt_state/1/mu/w') instead of position
    ('opt_state/1/1/w')."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_name_alias_map(v, f"{prefix}{k}/", f"{nprefix}{k}/"))
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "shape"):
        fields = getattr(tree, "_fields", None)
        for i, v in enumerate(tree):
            name = fields[i] if fields else str(i)
            out.update(_name_alias_map(v, f"{prefix}{i}/",
                                       f"{nprefix}{name}/"))
    else:
        out[nprefix[:-1]] = prefix[:-1]
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
        flat_target = _flatten(target)
        if set(flat) != set(flat_target):
            # some exports (orbax restore -> np.savez) key namedtuple
            # fields by NAME ('opt_state/1/mu/...') where _flatten keys
            # positionally ('opt_state/1/1/...'). Build the name-variant
            # paths from the TARGET's own structure and translate.
            alias = _name_alias_map(target)
            flat = {alias.get(k, k): v for k, v in flat.items()}
            # empty optax states (clip's EmptyState) appear in such
            # exports as pickled-None placeholders with no counterpart
            # in the positional flatten — drop them
            flat = {k: v for k, v in flat.items()
                    if not (getattr(v, "dtype", None) == object
                            and getattr(v, "ndim", 1) == 0
                            and v.item() is None)}
        missing = set(flat_target) - set(flat)
        extra = set(flat) - set(flat_target)
        assert not missing and not extra, (
            f"checkpoint/state key mismatch: missing={sorted(missing)[:5]} "
            f"extra={sorted(extra)[:5]}")
        # Rebuild STRUCTURALLY by key path, mirroring _flatten's traversal.
        # (jax.tree.flatten sorts dict keys while _flatten uses insertion
        # order — pairing leaves positionally across the two orders used to
        # scramble values between same-shaped subtrees, e.g. loading Adam
        # moments as network weights on npz resume.)
        def rebuild(t, prefix=""):
            if isinstance(t, dict):
                return {k: rebuild(v, f"{prefix}{k}/") for k, v in t.items()}
            if isinstance(t, (list, tuple)) and not hasattr(t, "shape"):
                seq = [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(t)]
                if hasattr(t, "_fields"):          # namedtuple (optax states)
                    return type(t)(*seq)
                return type(t)(seq)
            val = flat[prefix[:-1]]
            return val.astype(np.asarray(t).dtype) if hasattr(t, "dtype") \
                else val
        return rebuild(target)
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)


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

"""Device-mesh utilities.

The framework uses a 2-axis logical mesh:
  * 'data'  — batch / image-pair parallelism (the workhorse axis; replaces
    the reference's single-device batched inference, xfeat.py:50,188).
  * 'model' — tensor parallelism for the fine-matcher MLP and keypoint-set
    (sequence) sharding for large matching problems.

On a multi-host pod slice, call `jax.distributed.initialize()` before
`make_mesh`; data-axis shards then ride DCN across hosts while model-axis
collectives stay on ICI within a host's chips (axis order puts 'model'
innermost = fastest-varying devices = ICI neighbours).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None,
              axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_on(mesh: Mesh, tree, axis: str = "data"):
    return jax.device_put(tree, NamedSharding(mesh, P(axis)))

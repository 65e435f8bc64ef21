"""Multi-host initialization and mesh construction.

On a TPU pod slice, call `initialize()` once per host before any JAX
computation; then `make_pod_mesh()` builds the (data, model) mesh over ALL
hosts' devices. Model-axis collectives stay on ICI (innermost axis =
neighbouring devices); the data axis spans hosts over DCN.

Single-host (including this 1-chip dev box) these are no-ops/fallbacks, so
the same training script runs unchanged at any scale:

    from accelerated_features_tpu.parallel import distributed
    distributed.initialize()                      # no-op single-host
    mesh = distributed.make_pod_mesh(model=2)     # dp x tp over the slice
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """jax.distributed.initialize with env-var fallbacks; returns True when
    multi-host is active. Safe to call on a single host (no-op)."""
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def make_pod_mesh(model: int = 1, axis_names=("data", "model")):
    """(n_devices/model, model) mesh over every device in the slice."""
    n = len(jax.devices())
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    return make_mesh((n // model, model), axis_names=axis_names)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0

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
    multi-host is active. Safe to call on a single host (no-op).

    Unset values stay None so jax can AUTO-DETECT them from the cluster
    environment (TPU pod metadata / coordinator handshake) — forcing
    num_processes=1 here would silently skip multi-host init on a real
    pod slice, and passing num_processes without process_id crashes
    every non-zero host."""
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if coordinator_address is None:
        coordinator_address = os.environ.get("COORDINATOR_ADDRESS")
    # TPU_WORKER_HOSTNAMES counts as a cluster signal only with MULTIPLE
    # workers — single-host runtimes (incl. this dev box's relay) export
    # it as just "localhost"
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    in_cluster = (coordinator_address is not None
                  or (num_processes or 1) > 1
                  or "," in workers
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not in_cluster:
        return False                       # plain single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,       # None -> auto-detect
        process_id=process_id)             # None -> auto-detect
    return jax.process_count() > 1


def make_pod_mesh(model: int = 1, axis_names=("data", "model")):
    """(n_devices/model, model) mesh over every device in the slice."""
    n = len(jax.devices())
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    return make_mesh((n // model, model), axis_names=axis_names)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0

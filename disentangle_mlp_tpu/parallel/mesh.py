"""Device mesh + sharding layer — the TPU-native replacement for
``torch.nn.DataParallel``.

The reference's only parallelism is single-process DataParallel: replicate
the module, scatter the batch, gather outputs, every forward (reference:
experiments/new_betavaegan.py:42-44, new_vae.py:33, new_gan.py:51-53;
SURVEY.md §2.2). The TPU-native form is SPMD: one 1-D ``Mesh(('data',))``
over all chips, parameters replicated, batch sharded along axis 0; XLA
inserts the gradient/BatchNorm collectives over ICI automatically when the
train step is jitted with these shardings. Cross-host (pod) execution uses
the same code path after ``jax.distributed.initialize`` — call
:func:`maybe_initialize_distributed` first on each host.

Unlike DataParallel (per-GPU BatchNorm statistics, gather to GPU0 every
step), the mesh formulation computes global-batch statistics and keeps
parameters resident — strictly better scaling behaviour on ICI.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX when launched with the explicit env
    contract — JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES and
    JAX_PROCESS_ID when no cluster scheduler provides them) — a no-op on
    a single host and when already initialized. Exercised for real by the
    two-OS-process pod-path test (tests/test_multiprocess.py)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr or jax.distributed.is_initialized():
        return
    kwargs = {"coordinator_address": addr}
    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if n is not None and pid is not None:
        kwargs.update(num_processes=int(n), process_id=int(pid))
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: int = 0,
              devices: Optional[list] = None) -> Mesh:
    """1-D data-parallel mesh over ``n_devices`` (0 = all visible)."""
    devs = devices if devices is not None else jax.devices()
    if n_devices and n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf of a pytree fully replicated on the mesh."""
    sh = replicated_sharding(mesh)
    return jax.device_put(tree, sh)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch sharded along axis 0 across the mesh."""
    sh = batch_sharding(mesh)
    return jax.device_put(batch, sh)

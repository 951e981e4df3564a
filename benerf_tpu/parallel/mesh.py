"""Device mesh + sharding setup: ray-data parallelism over ICI/DCN.

The reference is single-GPU (train.py:472,486) — parallelism is new design
(SURVEY.md §2.4). The natural scalable axis of this workload is rays-per-step
(no sequence dimension exists): we lay out a 1-D "data" mesh, shard every
per-ray tensor over it, replicate parameters (the MLP is ~1.2 MB — far below
the threshold where tensor parallelism pays), and let XLA SPMD emit the
gradient all-reduce over ICI, overlapped with the backward pass.

Multi-host: call `initialize_distributed()` before any jax op; each host
loads the same (tiny) scene and the mesh spans all slices. CI simulates N
devices with XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed():
    """jax.distributed.initialize() iff launched in a multi-process env."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def make_mesh(n_devices: int = -1) -> Optional[Mesh]:
    """1-D data mesh over the first n_devices (all if -1). None if single."""
    devices = jax.devices()
    if n_devices == -1:
        n_devices = len(devices)
    if n_devices <= 1:
        return None
    import numpy as np

    return Mesh(np.array(devices[:n_devices]), (DATA_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_tree(tree, mesh: Optional[Mesh]):
    """Place a pytree replicated on the mesh (params, optimizer state)."""
    if mesh is None:
        return tree
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

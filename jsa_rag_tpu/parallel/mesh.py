"""Device mesh construction and axis conventions.

The framework uses a single 2-D logical mesh:

- ``data``  — data-parallel axis: batches, optimizer state (FSDP-style), grads.
- ``index`` — index-shard axis: rows of the passage-embedding matrix.

The retrieval index is sharded over *all* devices (both axes flattened), so a
mesh of shape (data=2, index=4) still gives 8 distinct index shards; training
math shards batches over ``data`` and replicates params over ``index`` (or
shards them FSDP-style over ``data``).

This replaces the reference's torch.distributed/SLURM bootstrap
(reference: src/slurm.py:49-187, src/torchrun_utils.py) — in JAX the process
group is implicit in the mesh, and multi-host init is
``jax.distributed.initialize()``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    index: str = "index"

    @property
    def all(self) -> tuple[str, str]:
        return (self.data, self.index)


AXES = MeshAxes()


def make_mesh(
    n_data: int = 1,
    n_index: int | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build the (data, index) mesh.

    ``n_index`` defaults to ``len(devices) // n_data``. The product must equal
    the device count.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_index is None:
        if n % n_data != 0:
            raise ValueError(f"n_data={n_data} does not divide device count {n}")
        n_index = n // n_data
    if n_data * n_index != n:
        raise ValueError(
            f"mesh shape ({n_data}, {n_index}) != device count {n}"
        )
    arr = np.asarray(devices).reshape(n_data, n_index)
    return Mesh(arr, (AXES.data, AXES.index))


def default_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """All devices on the ``index`` axis; ``data`` axis of size 1.

    Right default for retrieval-dominant workloads; training configs pick an
    explicit split via :func:`make_mesh`.
    """
    return make_mesh(n_data=1, devices=devices)


def index_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the (N, d) passage-embedding matrix: rows split over every
    device (both mesh axes flattened)."""
    return NamedSharding(mesh, P(AXES.all, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(AXES.data))


def multihost_init() -> None:
    """Initialize JAX distributed across hosts if launched under a
    multi-process coordinator (replaces src/slurm.py's NCCL bootstrap).

    Safe no-op in single-process runs.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()

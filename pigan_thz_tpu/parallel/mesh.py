"""Device-mesh construction.

New capability: the reference is single-process with zero distributed code
(SURVEY §2.2), so this layer is designed TPU-first rather than ported:
a 2-D (data, model) `jax.sharding.Mesh` over ICI, with data parallelism as
the default axis and tensor parallelism available for the wide forward
surrogate.  Multi-host runs reuse the same axes over DCN via
`jax.distributed` initialization (mesh construction is topology-agnostic).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, model) mesh.  With defaults, all devices go to the
    data axis.  `data=None` infers data = n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: call once per process before building the mesh.

    After this, `jax.devices()` spans all hosts and `make_mesh` lays the
    same (data, model) axes over ICI within a slice and DCN across slices —
    no code changes anywhere else (the scaling-book recipe).  Arguments are
    optional because TPU pod environments auto-populate them.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)

"""Sharding rules and the parallel epoch driver.

Strategy (scaling-book style: pick a mesh, annotate shardings, let XLA insert
collectives):

- **Data parallel** (default): the per-step minibatch is constrained to
  `P('data')` on its batch axis; parameters stay replicated, so XLA emits a
  psum over ICI for the gradient all-reduce inside the fused train step.
- **Tensor parallel** (optional `model` axis): 2-D kernels with a dimension
  wide enough to split (>= `min_shard_dim`, divisible by the axis size) are
  sharded on that dimension — this splits the forward surrogate's
  1024-wide hidden layers across chips; XLA inserts the matching
  all-reduces.  Everything else is replicated.

The reference has no distributed path at all (SURVEY §2.2); this module is
the TPU-native scale-out design, validated on a virtual CPU mesh in tests
and by the driver's `dryrun_multichip`.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.dataset import ThzDataset, epoch_indices, gather_batch
from .mesh import DATA_AXIS, MODEL_AXIS


def param_partition_spec(path_unused, x: jax.Array, model_size: int, min_shard_dim: int) -> P:
    """Partitioning rule for one parameter leaf (largest eligible dim on the
    model axis; replicate otherwise)."""
    if model_size <= 1 or x.ndim == 0:
        return P()
    # prefer sharding the output/feature dim of 2D kernels
    candidates = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in candidates:
        if x.shape[d] >= min_shard_dim and x.shape[d] % model_size == 0:
            spec = [None] * x.ndim
            spec[d] = MODEL_AXIS
            return P(*spec)
    return P()


def state_shardings(state: Any, mesh: Mesh, min_shard_dim: int = 512):
    """NamedSharding pytree for a train state: model-axis TP on wide kernels,
    replication elsewhere."""
    model_size = mesh.shape[MODEL_AXIS]

    def rule(x):
        if not hasattr(x, "ndim"):
            return NamedSharding(mesh, P())
        return NamedSharding(
            mesh, param_partition_spec(None, x, model_size, min_shard_dim)
        )

    return jax.tree.map(rule, state)


def shard_state(state: Any, mesh: Mesh, min_shard_dim: int = 512):
    """Place a train state onto the mesh according to `state_shardings`."""
    return jax.device_put(state, state_shardings(state, mesh, min_shard_dim))


def replicate_dataset(ds: ThzDataset, mesh: Mesh) -> ThzDataset:
    """The dataset is ~1 MB — replicate it so every data shard gathers its
    minibatch rows locally (no cross-chip gather)."""
    return jax.device_put(ds, NamedSharding(mesh, P()))


def make_parallel_epoch_fn(step_fn, batch_size: int, mesh: Mesh, with_scale: bool = False):
    """Parallel variant of train.steps.make_epoch_fn: same scan-over-batches
    structure, with the per-step batch constrained to the data axis so the
    whole fused D+G step runs SPMD over the mesh."""
    batch_spec = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(state, ds: ThzDataset, key: jax.Array, scale: jax.Array = 1.0):
        idx = epoch_indices(key, ds.spectra.shape[0], batch_size)

        def body(st, ix):
            batch = gather_batch(ds, ix)
            batch = tuple(
                jax.lax.with_sharding_constraint(b, batch_spec) for b in batch
            )
            if with_scale:
                st, m = step_fn(st, batch, scale)
            else:
                st, m = step_fn(st, batch)
            return st, m

        state, ms = jax.lax.scan(body, state, idx)
        return state, jax.tree.map(jnp.mean, ms)

    return epoch


def make_parallel_multi_epoch_fn(
    step_fn, batch_size: int, mesh: Mesh, with_scale: bool = False, unroll: int = 3
):
    """Mesh-parallel variant of train.steps.make_multi_epoch_fn: scans E
    whole epochs per jit call with the per-step batch constrained to the
    data axis.  multi_epoch(state, ds, key, scales(E,)) -> (state, (E,...))."""
    batch_spec = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, donate_argnums=(0,))
    def multi_epoch(state, ds: ThzDataset, key: jax.Array, scales: jax.Array):
        keys = jax.random.split(key, scales.shape[0])

        def epoch_body(st, inputs):
            ekey, scale = inputs
            idx = epoch_indices(ekey, ds.spectra.shape[0], batch_size)

            def body(st, ix):
                batch = gather_batch(ds, ix)
                batch = tuple(
                    jax.lax.with_sharding_constraint(b, batch_spec) for b in batch
                )
                if with_scale:
                    st, m = step_fn(st, batch, scale)
                else:
                    st, m = step_fn(st, batch)
                return st, m

            st, ms = jax.lax.scan(body, st, idx, unroll=unroll)
            return st, jax.tree.map(jnp.mean, ms)

        state, ms = jax.lax.scan(epoch_body, state, (keys, scales))
        return state, ms

    return multi_epoch

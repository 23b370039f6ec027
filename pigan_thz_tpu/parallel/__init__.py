from .ensemble import (
    EnsembleSettings,
    init_ensemble_states,
    make_ensemble_epoch_fn,
    make_ensemble_multi_epoch_fn,
    make_ensemble_pigan_step,
    shard_ensemble,
    weight_vector,
)
from .hlo_check import assert_mesh_collectives, check_mesh_collectives
from .mesh import DATA_AXIS, MODEL_AXIS, batch_sharding, make_mesh, replicated
from .sharding import (
    make_parallel_epoch_fn,
    make_parallel_multi_epoch_fn,
    param_partition_spec,
    replicate_dataset,
    shard_state,
    state_shardings,
)

__all__ = [
    "DATA_AXIS",
    "EnsembleSettings",
    "assert_mesh_collectives",
    "check_mesh_collectives",
    "init_ensemble_states",
    "make_ensemble_epoch_fn",
    "make_ensemble_multi_epoch_fn",
    "make_ensemble_pigan_step",
    "shard_ensemble",
    "weight_vector",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "make_parallel_epoch_fn",
    "make_parallel_multi_epoch_fn",
    "param_partition_spec",
    "replicate_dataset",
    "replicated",
    "shard_state",
    "state_shardings",
]

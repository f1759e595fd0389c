from .distributed import init_distributed
from .mesh import (
    batch_sharding,
    make_mesh,
    mesh_spans_processes,
    param_sharding_rules,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)
from .train_step import TrainState, create_train_state, make_optimizer, make_train_step

__all__ = [
    "init_distributed",
    "batch_sharding",
    "make_mesh",
    "mesh_spans_processes",
    "param_sharding_rules",
    "param_shardings",
    "replicated",
    "shard_batch",
    "shard_params",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
]

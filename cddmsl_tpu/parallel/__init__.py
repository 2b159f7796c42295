from .mesh import (
    batch_sharding,
    create_mesh,
    mesh_from_cfg,
    replicate,
    replicated,
    shard_batch,
)
from .collectives import all_gather_cat, gather_tensors, pmean_dict
from .fsdp import fsdp_shard, fsdp_shardings
from .tp import DEFAULT_TP_RULES, param_shardings, rules_from_cfg, shard_params
from . import multihost

__all__ = [
    "multihost",
    "DEFAULT_TP_RULES",
    "param_shardings",
    "rules_from_cfg",
    "shard_params",
    "batch_sharding",
    "create_mesh",
    "mesh_from_cfg",
    "replicate",
    "replicated",
    "shard_batch",
    "all_gather_cat",
    "gather_tensors",
    "pmean_dict",
]

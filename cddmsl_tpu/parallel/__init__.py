from .mesh import (
    batch_sharding,
    create_mesh,
    mesh_from_cfg,
    replicate,
    replicated,
    shard_batch,
)
from .collectives import all_gather_cat, gather_tensors, pmean_dict

__all__ = [
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

"""Device mesh + sharding utilities.

The TPU-native replacement for the reference's process-per-GPU DDP stack
(detectron2/engine/launch.py:27-125, utils/comm.py): one Python process, one
jit program over a `jax.sharding.Mesh`. The batch is sharded on the 'data'
axis, parameters/optimizer state are replicated, gradients are averaged by
XLA's implicit collectives during backward (DDP ring-allreduce equivalent),
and the contrastive losses see the global batch (GatherLayer equivalent).
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(mesh_shape: Sequence[int] = (-1,), axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = np.asarray(jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    need = int(np.prod(shape))
    assert need <= len(devices), f"mesh {shape} needs {need} devices, have {len(devices)}"
    return Mesh(devices[:need].reshape(shape), tuple(axis_names))


def mesh_from_cfg(cfg) -> Mesh:
    return create_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXES))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree with its leading dim sharded over `axis`."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") and x.ndim > 0 else x,
        batch,
    )


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)

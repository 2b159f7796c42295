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


def _put(x, sharding: NamedSharding):
    """device_put that also works when `sharding` spans multiple processes
    (multi-host): each process contributes its local block via
    `jax.make_array_from_process_local_data` (parallel/multihost.py design
    note — loaders hand every process the contiguous row-block owned by its
    devices, so local data IS the process shard)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data", spatial_axis: Optional[str] = None):
    """Place a host batch pytree with its leading dim sharded over `axis`.

    With `spatial_axis` (e.g. 'model'), image tensors — NHWC leaves with
    C==3 whose H divides the axis size — are ALSO sharded on H, i.e.
    P(axis, spatial_axis). This is spatial partitioning of the full-res
    backbone: XLA's SPMD partitioner runs every conv on an H-shard and
    inserts the halo-exchange collectives at layer boundaries (the CNN
    analogue of sequence parallelism; the reference's DDP has no such
    axis). Activations of the heaviest layers (stride 2/4 stages on
    800x1344 inputs) shrink by the axis size per chip; math is unchanged
    (halo exchange keeps convolutions exact).

    Multi-host: the host batch is this process's row-block of the global
    batch (data/build.py loaders slice it); the global array is assembled
    across processes by `_put`.
    """
    sharding = batch_sharding(mesh, axis)
    spatial = (
        NamedSharding(mesh, P(axis, spatial_axis)) if spatial_axis is not None else None
    )
    sp = mesh.shape[spatial_axis] if spatial_axis is not None else 1

    def place(x):
        if not (hasattr(x, "shape") and x.ndim > 0):
            return x
        if (
            spatial is not None
            and x.ndim == 4
            and x.shape[-1] == 3
            and x.shape[1] % sp == 0
        ):
            return _put(x, spatial)
        return _put(x, sharding)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        # every process supplies the identical full value (P() -> the
        # process-local block IS the whole array)
        return jax.tree_util.tree_map(lambda x: _put(x, sharding), tree)
    return jax.device_put(tree, sharding)

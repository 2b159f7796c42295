"""Named-axis collectives for shard_map code paths.

Equivalents of the reference's communication layer:
  * GatherLayer (clipcap/gather.py:5-19, grad-carrying all_gather)
    -> `all_gather_cat` (jax.lax.all_gather is differentiable by construction)
  * comm.gather_tensors (utils/comm.py:268-323, no-grad min-batch gather)
    -> `gather_tensors` (stop_gradient + all_gather; batches are equal by
       static-shape discipline so no min-batch truncation is needed)
  * comm.reduce_dict (utils/comm.py:237) -> `pmean_dict`

Only needed inside `shard_map`-style per-shard code; the main train step is
global-view jit where XLA inserts collectives automatically.
"""

from typing import Dict

import jax
import jax.numpy as jnp


def all_gather_cat(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    """(n, ...) per shard -> (world*n, ...), differentiable (grads scatter
    back to the owning shard, like GatherLayer.backward)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def gather_tensors(x: jnp.ndarray, axis_name: str = "data") -> jnp.ndarray:
    return jax.lax.all_gather(jax.lax.stop_gradient(x), axis_name, axis=0, tiled=True)


def pmean_dict(d: Dict[str, jnp.ndarray], axis_name: str = "data") -> Dict[str, jnp.ndarray]:
    return {k: jax.lax.pmean(v, axis_name) for k, v in d.items()}

"""Test / dryrun helpers (reference: detectron2/utils/testing.py provides
random-input builders for its test suite; here the main concern is COMPILE
TIME — flax `Module.init` executes the full forward op-by-op, which takes
minutes on a single weak CPU core, while the tests only need *a* valid
parameter pytree of the right structure).
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def materialize_params(init_fn, *args, seed: int = 0, scale: float = 0.02) -> Any:
    """Build a parameter pytree from `jax.eval_shape(init_fn, *args)` with a
    deterministic strictly-positive host-side fill.

    No forward pass is executed or compiled. Strictly positive values keep
    FrozenBatchNorm's rsqrt(running_var + eps) finite. Use wherever the test
    needs valid (not learned, not distribution-faithful) parameters.
    """
    shapes = jax.eval_shape(init_fn, *args)
    fill = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda s: jnp.asarray(np.abs(fill.standard_normal(s.shape)) * scale + scale / 2, s.dtype),
        shapes,
    )

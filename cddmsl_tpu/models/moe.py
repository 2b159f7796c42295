"""Mixture-of-experts MLP (Switch-style top-1 routing) with optional
expert parallelism.

The reference's contrastive projector is a dense Linear-ReLU-Linear
(detectron2/modeling/meta_arch/rcnn.py:95-99); `MoEMLP` is its
capacity-scaled drop-in: E expert MLPs behind a learned router, parameter
count x E at constant per-token FLOPs. Routing/dispatch/EP mechanics live
in parallel/ep.py; this module owns the params and the Flax surface.

Returns (y, aux) where aux is the Switch load-balance loss — the caller
folds `aux_weight * aux` into its loss dict (GeneralizedRCNN._project).
Tokens dropped by the capacity rule produce zero output rows (GShard
overflow semantics); capacity_factor 1.25 makes drops rare once the router
balances.
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..parallel.ep import moe_apply_dense, moe_apply_ep, moe_capacity, top1_dispatch


class MoEMLP(nn.Module):
    """E-expert Linear-ReLU-Linear with top-1 routing.

    expert_axis: mesh axis sharding the expert params + compute
    (parallel/ep.py moe_apply_ep); None/"" or an axis absent from the
    ambient mesh falls back to the dense single-program path — numerically
    identical (tests/test_expert_parallel.py).
    """

    num_experts: int = 4
    in_dim: int = 768
    hidden: int = 768
    out_dim: int = 256
    capacity_factor: float = 1.25
    expert_axis: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (N, in_dim) -> ((N, out_dim), aux scalar)."""
        e = self.num_experts
        logits = nn.Dense(e, dtype=jnp.float32, param_dtype=jnp.float32, name="router")(
            x.astype(jnp.float32)
        )
        cap = moe_capacity(x.shape[0], e, self.capacity_factor)
        dispatch, combine, aux = top1_dispatch(logits, cap)
        scale = lambda d: nn.initializers.normal(d ** -0.5)
        params = {
            "w1": self.param("w1", scale(self.in_dim), (e, self.in_dim, self.hidden)),
            "b1": self.param("b1", nn.initializers.zeros, (e, self.hidden)),
            "w2": self.param("w2", scale(self.hidden), (e, self.hidden, self.out_dim)),
            "b2": self.param("b2", nn.initializers.zeros, (e, self.out_dim)),
        }

        def expert_apply(p, a):  # a: (C, in_dim) one expert's buffer
            h = nn.relu(a @ p["w1"] + p["b1"])
            return h @ p["w2"] + p["b2"]

        use_ep = bool(self.expert_axis) and not self.is_initializing()
        if use_ep:
            import jax

            mesh = jax.sharding.get_abstract_mesh()
            use_ep = mesh is not None and self.expert_axis in mesh.axis_names
        if use_ep:
            y = moe_apply_ep(
                expert_apply, params, x, dispatch, combine, axis=self.expert_axis
            )
        else:
            y = moe_apply_dense(expert_apply, params, x, dispatch, combine)
        return y.astype(x.dtype), aux

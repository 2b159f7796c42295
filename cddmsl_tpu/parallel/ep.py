"""Expert parallelism: GShard/Switch-style mixture-of-experts dispatch with
experts sharded over a mesh axis.

The reference has no MoE anywhere (its projector is a dense 2-layer MLP,
detectron2/modeling/meta_arch/rcnn.py:95-99); like parallel/tp.py and
parallel/pp.py this is TPU-native capability beyond parity, built so any
MLP in the framework can scale its parameter count E-fold without scaling
per-chip memory or FLOPs.

Mechanism (static shapes, no sorting, no host work):
  * router: per-token logits over E experts -> top-1 expert + gate prob
    (Switch Transformer routing).
  * dispatch: each token takes a slot in its expert's capacity-C buffer via
    a cumsum over the one-hot routing matrix; tokens past capacity are
    dropped (their combine weight is 0) — the standard GShard overflow rule,
    needed for static shapes.
  * expert compute: the stacked expert params (leading axis E) are sharded
    over the `expert` mesh axis inside a shard_map; each rank builds the
    capacity buffers for ITS experts only. Under DP x EP the token dimension
    is also sharded, so each data shard contributes a partial buffer and one
    psum over 'data' assembles complete buffers (the collective that plays
    the role of GShard's all_to_all dispatch); after the expert MLPs, a psum
    over 'expert' combines the partial outputs back onto every token's rank.
  * aux loss: the Switch load-balancing term E * sum_e f_e * P_e (f = routed
    token fraction, P = mean router prob), differentiable through P.

Everything is ordinary differentiable JAX (einsum one-hot dispatch), so
jax.grad trains the router and experts through the EP program, and it
composes with DP/TP/PP/SP in the same jitted step — the n=8 multichip
dryrun runs the MoE projector expert-sharded over the SAME axis TP uses.

Exactness: the EP path is verified equal to the dense single-device
reference (same capacity/drop semantics) in tests/test_expert_parallel.py.
"""

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P


def top1_dispatch(
    gate_logits: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Switch-style top-1 routing.

    gate_logits: (N, E) router logits.
    Returns (dispatch (N, E, C) {0,1}, combine (N, E, C) gate-weighted,
    aux scalar load-balance loss). Tokens beyond an expert's capacity C are
    dropped: all-zero dispatch/combine rows (the MoE layer's residual/zero
    output convention is the caller's choice).
    """
    n, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)  # (N, E)
    expert = jnp.argmax(probs, axis=-1)  # (N,)
    gate = jnp.take_along_axis(probs, expert[:, None], axis=-1)[:, 0]  # (N,)
    onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # (N, E)
    # slot of each token within its expert's buffer (0-based); tokens keep
    # arrival order, matching the sequential greedy fill
    pos = jnp.cumsum(onehot, axis=0) * onehot - onehot  # (N, E), 0-based where routed
    within = (pos < capacity) * onehot  # (N, E) routed AND under capacity
    dispatch = jax.nn.one_hot(pos.astype(jnp.int32), capacity, dtype=jnp.float32) * within[..., None]
    combine = dispatch * gate[:, None, None]
    # Switch load-balance aux: E * sum_e (token fraction to e) * (mean prob of e)
    frac = jnp.mean(onehot, axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac * mean_prob)
    return dispatch, combine, aux


def moe_apply_dense(
    expert_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    dispatch: jnp.ndarray,
    combine: jnp.ndarray,
) -> jnp.ndarray:
    """Single-program reference: buffers -> vmapped experts -> combine."""
    buffers = jnp.einsum("nec,nd->ecd", dispatch, x.astype(jnp.float32))  # (E, C, D)
    outs = jax.vmap(expert_apply)(stacked_params, buffers)  # (E, C, Dout)
    return jnp.einsum("nec,ecd->nd", combine, outs.astype(jnp.float32))


def moe_apply_ep(
    expert_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    dispatch: jnp.ndarray,
    combine: jnp.ndarray,
    mesh=None,
    axis: str = "expert",
    batch_axis: str = "data",
) -> jnp.ndarray:
    """Expert-parallel MoE: experts sharded over `axis`, tokens over
    `batch_axis` (when the mesh carries it). Numerically identical to
    moe_apply_dense.

    x: (N, D); dispatch/combine: (N, E, C) from top1_dispatch with GLOBAL
    capacity semantics (C counts slots over the full N).
    """
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    assert mesh is not None and axis in mesh.axis_names, (
        f"moe_apply_ep needs a mesh carrying {axis!r}"
    )
    e = dispatch.shape[1]
    assert e % mesh.shape[axis] == 0, f"{e} experts not divisible by {axis}={mesh.shape[axis]}"
    has_batch = batch_axis in mesh.axis_names
    bspec = P(batch_axis) if has_batch else P()
    # (N, E, C) dispatch/combine: N over the batch axis (if any), E over the
    # expert axis — spelled explicitly so the no-batch-axis case doesn't
    # slide the expert axis onto dim 0
    dspec = P(batch_axis if has_batch else None, axis, None)
    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)

    def local_fn(params_shard, xloc, dloc, cloc):
        # partial buffers from THIS data shard's tokens for THIS rank's
        # experts; psum over the batch axis assembles complete buffers
        # (GShard's dispatch communication)
        buffers = jnp.einsum("nec,nd->ecd", dloc, xloc.astype(jnp.float32))
        if batch_axis in mesh.axis_names:
            buffers = jax.lax.psum(buffers, batch_axis)
        outs = jax.vmap(expert_apply)(params_shard, buffers)  # (E_loc, C, Dout)
        y = jnp.einsum("nec,ecd->nd", cloc, outs.astype(jnp.float32))
        return jax.lax.psum(y, axis)  # combine partial outputs across expert shards

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(param_specs, bspec, dspec, dspec),
        out_specs=bspec,
    )
    return fn(stacked_params, x, dispatch, combine)


def moe_capacity(n_tokens: int, n_experts: int, capacity_factor: float = 1.25) -> int:
    """GShard capacity rule, rounded up and never below 1."""
    import math

    return max(1, math.ceil(n_tokens / n_experts * capacity_factor))

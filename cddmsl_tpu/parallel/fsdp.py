"""Fully-sharded data parallelism (ZeRO-3-style) as a layout annotation.

The reference's DDP replicates every parameter and optimizer moment on every
GPU (detectron2/engine/launch.py). On TPU, sharding the parameters (and, by
the same device_put over the TrainState, their optax moments) along the
'data' mesh axis makes XLA's SPMD partitioner all-gather each weight just
before use and reduce-scatter its gradient — the "How to Scale Your Model"
FSDP recipe, with zero changes to the jitted step. Per-chip parameter +
moment memory drops by the data-axis size; numerics are exactly DP
(all-gather is exact), verified in tests/test_fsdp.py.

Composes with tensor parallelism: parameters matched by a TP rule keep the
TP layout ('model'-axis shards); the rest get dim-0 'data' shards here.

CPU-emulation caveat (does NOT apply to TPU): under the default
concurrency-optimized XLA:CPU scheduler the per-param all-gathers are
independent thunks and can be launched in divergent orders across virtual
devices, deadlocking the in-process collective rendezvous on small hosts.
Set XLA_FLAGS=--xla_cpu_enable_concurrency_optimized_scheduler=false when
running FSDP on the CPU platform (tests/_fsdp_step_check.py does; the
trainer warns). TPU executes collectives in program order.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_shardings(
    params,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = 2**12,
    tp_rules: Optional[Sequence[Tuple[str, Tuple]]] = None,
):
    """Pytree of NamedShardings: each leaf sharded on its largest divisible
    dimension over `axis`; small leaves (< min_size elements) and
    indivisible leaves stay replicated. If `tp_rules` is given, leaves a TP
    rule matches take the TP spec instead (tensor axis on 'model', the rest
    of the leaf still replicated — XLA keeps the two axes orthogonal)."""
    from .tp import DEFAULT_TP_RULES, _spec_for

    n = mesh.shape[axis]

    def path_str(kp) -> str:
        return "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    shardings = []
    for kp, leaf in flat:
        shape = getattr(leaf, "shape", ())
        spec = P()
        if tp_rules is not None:
            tp_spec = _spec_for(path_str(kp), tp_rules, mesh.axis_names)
            if any(s is not None for s in tp_spec):
                ok = all(
                    s is None or shape[d] % mesh.shape[s] == 0
                    for d, s in enumerate(tp_spec)
                )
                if ok:
                    shardings.append(NamedSharding(mesh, tp_spec))
                    continue
        if shape and int(np.prod(shape)) >= min_size:
            # largest divisible dim -> best balance, fewest pad elements
            dims = sorted(range(len(shape)), key=lambda d: -shape[d])
            for d in dims:
                if shape[d] % n == 0:
                    spec = P(*[axis if i == d else None for i in range(len(shape))])
                    break
        shardings.append(NamedSharding(mesh, spec))

    treedef = jax.tree_util.tree_flatten(params)[1]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def fsdp_shard(tree, mesh: Mesh, axis: str = "data", min_size: int = 2**12, tp_rules=None):
    """device_put `tree` (params or a whole TrainState) with FSDP shardings.
    Optimizer moments inside a TrainState share their parameter's path shape
    and so land on the same shards."""
    return jax.device_put(tree, fsdp_shardings(tree, mesh, axis, min_size, tp_rules))

"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh.

The reference's distributed story is process-per-GPU DDP (replicated
parameters only; detectron2/engine/launch.py). On TPU the mesh + XLA SPMD
make tensor parallelism a *layout annotation problem*: pick a mesh, assign
each parameter a PartitionSpec, and XLA inserts the collectives ("How to
Scale Your Model" recipe). This module implements the annotation step as
path-regex -> PartitionSpec rules, applied with jax.device_put before the
(unchanged) jitted train step — sharding propagation does the rest, and the
collectives ride ICI because 'model' is a mesh axis, never a host boundary.

Default rules apply the Megatron split where the FLOPs are:

* every transformer MLP — CLIP text/visual towers + GPT2 use
  `mlp_c_fc`/`mlp_c_proj`, the ClipCap V2L mapper uses `mlp_fc1`/`mlp_fc2`:

    fc kernel  (d, 4d): P(None, 'model')   column-parallel
    fc bias        (4d,): P('model')
    proj kernel (4d, d): P('model', None)  row-parallel

* the res5 bottlenecks (`layer4_*`) — the C4 RoI head runs res5 on 512
  crops/image (~50% of the train step): conv1 is column-parallel on its
  output channels (with bn1's per-channel params sharded to match) and
  conv2 is row-parallel on its input channels, so each bottleneck's two
  biggest convs run on W/|model| channel shards with one implicit psum.

Two implicit collectives per sharded block, all riding ICI. Attention and
the remaining convs stay replicated by default (extend TPU.TP_RULES to
shard more).

Config: TPU.MESH_SHAPE=[dp, mp] + TPU.MESH_AXES=['data','model'] activates
the 2-D mesh; TPU.TP_RULES overrides/extends the rule list.
"""

import re
from typing import Any, List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, partition spec expressed as a tuple of axis names / None).
# Paths are '/'-joined flax param paths, e.g.
# 'params/text_encoder/resblocks_3/mlp_c_fc/kernel'.
DEFAULT_TP_RULES: List[Tuple[str, Tuple[Any, ...]]] = [
    # transformer MLPs (CLIP towers / GPT2)
    (r".*/mlp_c_fc/kernel$", (None, "model")),
    (r".*/mlp_c_fc/bias$", ("model",)),
    (r".*/mlp_c_proj/kernel$", ("model", None)),
    # ClipCap V2L mapper MLPs
    (r".*/mlp_fc1/kernel$", (None, "model")),
    (r".*/mlp_fc1/bias$", ("model",)),
    (r".*/mlp_fc2/kernel$", ("model", None)),
    # res5 bottlenecks (C4 RoI head hot path): conv1 column-parallel (HWIO
    # output channels), bn1 sharded to match, conv2 row-parallel (input
    # channels -> implicit psum)
    (r".*/layer4_\d+/conv1/kernel$", (None, None, None, "model")),
    (r".*/layer4_\d+/bn1/(weight|bias|running_mean|running_var)$", ("model",)),
    (r".*/layer4_\d+/conv2/kernel$", (None, None, "model", None)),
    # MoE projector experts (models/moe.py, parallel/ep.py): leading E axis
    # sharded = expert parallelism; router stays replicated
    (r".*/projector/(w1|w2)$", ("model", None, None)),
    (r".*/projector/(b1|b2)$", ("model", None)),
]


def _spec_for(path: str, rules, mesh_axes) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            # drop axes the mesh doesn't carry (e.g. running the same config
            # on a pure-DP ('data',) mesh) and axes that don't divide the dim
            return P(*[a if (a is None or a in mesh_axes) else None for a in spec])
    return P()


def param_shardings(params, mesh: Mesh, rules: Sequence[Tuple[str, Tuple[Any, ...]]] = None):
    """Pytree of NamedShardings matching `params`, from path-regex rules.

    A rule only applies if every named axis in its spec exists in `mesh`
    and divides the corresponding parameter dimension — otherwise that
    parameter falls back to replicated, so the same rules work on any mesh.
    """
    rules = DEFAULT_TP_RULES if rules is None else rules
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp) -> str:
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    shardings = {}
    for kp, leaf in flat:
        path = path_str(kp)
        spec = _spec_for(path, rules, mesh.axis_names)
        # divisibility guard: an axis that doesn't divide the dim would fail
        # at device_put; degrade that axis to replicated instead
        if any(s is not None for s in spec):
            fixed = []
            for d, ax in zip(getattr(leaf, "shape", ()), tuple(spec) + (None,) * 8):
                if ax is not None and (d % mesh.shape[ax] != 0):
                    ax = None
                fixed.append(ax)
            spec = P(*fixed[: len(getattr(leaf, "shape", ()))])
        shardings[path] = NamedSharding(mesh, spec)

    leaves, treedef = jax.tree_util.tree_flatten(params)
    flat_shardings = [shardings[path_str(kp)] for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, flat_shardings)


def rules_from_cfg(cfg):
    """TPU.TP_RULES ([['regex', ['model', None]], ...]) -> rule list;
    empty -> DEFAULT_TP_RULES."""
    raw = getattr(cfg.TPU, "TP_RULES", [])
    if not raw:
        return DEFAULT_TP_RULES
    return [(pat, tuple(None if a in (None, "None", "") else a for a in spec)) for pat, spec in raw]


def shard_params(params, mesh: Mesh, rules=None):
    """device_put `params` with rule-based shardings (replicated where no
    rule matches). The jitted step's sharding propagation carries these
    layouts through grads and optimizer state."""
    return jax.device_put(params, param_shardings(params, mesh, rules))

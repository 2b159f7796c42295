"""Model analysis: parameter and FLOP counting.

Equivalent of the reference's fvcore-based flop/activation analysis
(detectron2/utils/analysis.py:52-152, tools/analyze_model.py) — but computed
from XLA's own cost model (`compiled.cost_analysis()`), which reflects the
actually-compiled TPU program rather than a per-op Python estimate.
"""

from typing import Any, Callable, Dict

import jax
import numpy as np


def parameter_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def parameter_count_table(params, max_depth: int = 2) -> str:
    """Per-subtree parameter counts (reference parameter_count_table)."""
    rows: Dict[str, int] = {}

    def walk(tree, path):
        for k, v in tree.items():
            p = path + (k,)
            if isinstance(v, dict):
                walk(v, p)
            else:
                key = ".".join(p[:max_depth])
                rows[key] = rows.get(key, 0) + int(np.prod(v.shape))

    walk(params if isinstance(params, dict) else jax.device_get(params), ())
    width = max(len(k) for k in rows) if rows else 10
    lines = [f"{'module':<{width}} | #params"]
    for k in sorted(rows, key=rows.get, reverse=True):
        lines.append(f"{k:<{width}} | {rows[k] / 1e6:.2f}M")
    lines.append(f"{'TOTAL':<{width}} | {sum(rows.values()) / 1e6:.2f}M")
    return "\n".join(lines)


def flop_count(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile `fn(*args)` and return XLA's cost analysis (flops, bytes
    accessed, ...). Works on any backend."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    return dict(cost) if cost else {}


def activation_count(fn: Callable, *args) -> int:
    """Upper bound on activation elements: sum of intermediate shapes from
    the jaxpr (the reference counts conv/linear outputs via fvcore)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    total = 0
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            aval = getattr(var, "aval", None)
            if aval is not None and hasattr(aval, "shape"):
                total += int(np.prod(aval.shape)) if aval.shape else 1
    return total

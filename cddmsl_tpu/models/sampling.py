"""Balanced positive/negative subsampling with static shapes.

Replaces the reference's `subsample_labels` (detectron2/modeling/
sampling.py:54), which uses dynamic-length `randperm` index tensors, with a
rank-by-random-key formulation: every candidate gets a uniform key, ranks are
computed among its group, and selection is `rank < quota` — all fixed-shape,
jit/vmap friendly, and distributionally identical (a uniform random subset of
each group).
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def _group_rank(key_vals: jnp.ndarray, member: jnp.ndarray) -> jnp.ndarray:
    """Rank of each member within its group ordered by random key (non-members
    get a rank >= group size)."""
    sort_key = jnp.where(member, key_vals, jnp.inf)
    order = jnp.argsort(sort_key)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return ranks


def _select_k_smallest(keys_masked: jnp.ndarray, quota_cap: int, count: jnp.ndarray) -> jnp.ndarray:
    """Members whose key ranks among the `count` smallest (count <= quota_cap
    traced; non-members carry +inf keys). top_k over the negated keys is a
    PARTIAL sort — O(n log k) vs the full argsort's O(n log n); for RPN
    sampling (n = 63k anchors, k = 256) this is the difference between a
    full-array sort and a cheap selection (docs/PERF.md round 3)."""
    k = min(quota_cap, keys_masked.shape[0])
    if k == 0:
        return jnp.zeros(keys_masked.shape, bool)
    smallest = -jax.lax.top_k(-keys_masked, k)[0]  # ascending k smallest
    thr = smallest[jnp.clip(count - 1, 0, k - 1)]
    return (keys_masked <= thr) & (count > 0)


def subsample_labels(
    key: jax.Array,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Choose <=num_samples elements: up to num_samples*positive_fraction
    random positives, remainder random negatives (uniform random subset of
    each group, distributionally identical to the reference's randperm).

    Returns (pos_selected, neg_selected) boolean masks.
    """
    k1, k2 = jax.random.split(key)
    n = positive.shape[0]
    rnd_pos = jnp.where(positive, jax.random.uniform(k1, (n,)), jnp.inf)
    rnd_neg = jnp.where(negative, jax.random.uniform(k2, (n,)), jnp.inf)

    num_pos_target = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(jnp.sum(positive.astype(jnp.int32)), num_pos_target)
    pos_sel = positive & _select_k_smallest(rnd_pos, num_pos_target, num_pos)

    num_neg = jnp.minimum(jnp.sum(negative.astype(jnp.int32)), num_samples - num_pos)
    neg_sel = negative & _select_k_smallest(rnd_neg, num_samples, num_neg)
    return pos_sel, neg_sel


def gather_selected(
    key: jax.Array,
    pos_sel: jnp.ndarray,
    neg_sel: jnp.ndarray,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack selected indices into a fixed-size buffer, positives first
    (mirroring the reference's torch.cat([pos_idx, neg_idx])).

    Returns (idx (capacity,), valid (capacity,))."""
    n = pos_sel.shape[0]
    rnd = jax.random.uniform(key, (n,))
    sort_key = jnp.where(pos_sel, rnd, jnp.where(neg_sel, 1.0 + rnd, jnp.inf))
    order = jnp.argsort(sort_key)[:capacity]
    valid = jnp.sort(sort_key)[:capacity] < jnp.inf
    idx = jnp.where(valid, order, 0)
    if capacity > n:
        idx = jnp.pad(idx, (0, capacity - n))
        valid = jnp.pad(valid, (0, capacity - n))
    return idx.astype(jnp.int32), valid

"""Batch-norm variants beyond FrozenBN (reference detectron2/layers/
batch_norm.py NaiveSyncBatchNorm + engine/hooks.py:397 PreciseBN).

The CDDMSL recipes freeze every BN (FrozenBatchNorm in clip_resnet.py), so
these exist for the parity surface: the LSJ offline-RPN option trains with
SyncBN (reference my_clip_rcnn.py:117-121), and PreciseBN re-estimates
running statistics before eval.

TPU-first: cross-replica synchronization is a named-axis `lax.pmean` inside
the one jitted step — the reference's NaiveSyncBatchNorm allreduce with no
`dist` plumbing.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SyncBatchNorm(nn.Module):
    """Training-mode batch norm whose batch statistics are averaged across
    the `axis_name` mesh axis (reference NaiveSyncBatchNorm semantics).

    Mutable collection 'batch_stats' carries running_mean/var for eval, like
    torch BN buffers; call with `train=False` to use them.
    """

    features: int
    momentum: float = 0.9
    eps: float = 1e-5
    axis_name: Optional[str] = "data"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: Optional[bool] = None):
        if train is None:
            # in-backbone use (RESNETS.NORM=SyncBN): train mode whenever the
            # caller made 'batch_stats' mutable (the train step applies with
            # mutable=['batch_stats']); every other apply — eval, mean-teacher
            # target forwards, converters — gets running-stat behavior without
            # any call-site signature change
            train = self.is_mutable_collection("batch_stats")
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "running_mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "running_var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        if train:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(x.astype(jnp.float32), axis=red)
            mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=red)
            if self.axis_name is not None:
                try:
                    mean = jax.lax.pmean(mean, self.axis_name)
                    mean2 = jax.lax.pmean(mean2, self.axis_name)
                except NameError:  # axis not bound (single-device path)
                    pass
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(self.dtype)


def update_bn_stats(apply_fn, variables, batches, momentum: float = 0.9):
    """PreciseBN (reference hooks.py:397-466): re-estimate batch_stats as the
    MEAN of the true per-batch statistics over `batches` (each batch counts
    equally, unlike the EMA the training loop maintains).

    apply_fn(variables, batch) must run one train-mode forward with
    mutable=['batch_stats'] and return (out, {'batch_stats': ...}). Every
    call starts from the SAME `variables`, so each mutated value is
    m*orig + (1-m)*batch_i; the raw batch statistic is recovered by
    inverting that affine before averaging.
    """
    orig = variables["batch_stats"]
    acc = None
    n = 0
    for batch in batches:
        _, mutated = apply_fn(variables, batch)
        raw = jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            mutated["batch_stats"],
            orig,
        )
        acc = raw if acc is None else jax.tree_util.tree_map(jnp.add, acc, raw)
        n += 1
    if n == 0:
        return variables
    mean_stats = jax.tree_util.tree_map(lambda s: s / n, acc)
    new_vars = dict(variables)
    new_vars["batch_stats"] = mean_stats
    return new_vars


class GroupNorm32(nn.Module):
    """GroupNorm with the reference's get_norm("GN") settings (32 groups,
    detectron2/layers/batch_norm.py get_norm) and torch-style param names
    (weight/bias) so checkpoint converters map GN layers the same way as BN.
    """

    features: int
    num_groups: int = 32
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        g = min(self.num_groups, self.features)
        shape = x.shape
        xf = x.astype(jnp.float32).reshape(shape[:-1] + (g, self.features // g))
        red = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=red, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=red, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (xf.reshape(shape) * weight + bias).astype(self.dtype)

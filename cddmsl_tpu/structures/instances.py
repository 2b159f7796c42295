"""Fixed-capacity `Instances`: the static-shape replacement for the
reference's dynamic-length `Instances` (detectron2/structures/instances.py).

An `Instances` holds a dict of arrays whose leading dim is the fixed capacity
N, plus a boolean `valid` mask (N,) marking which rows are real. All
operations preserve capacity; "removing" rows just clears validity. This is
the single most important design delta for TPU (SURVEY.md §7 point 1): every
model stage sees static shapes and compiles once.

Registered as a JAX pytree: arrays (fields + valid) are leaves, image_size is
static aux data so it participates in jit caching.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Instances:
    def __init__(
        self,
        image_size: Tuple[int, int],
        valid: Optional[jnp.ndarray] = None,
        **fields: Any,
    ):
        self._image_size = tuple(int(x) if not hasattr(x, "dtype") else x for x in image_size) if not _is_traced(image_size) else image_size
        self._fields: Dict[str, Any] = {}
        for k, v in fields.items():
            self.set(k, v)
        if valid is not None:
            self.set("valid", valid)

    # ---- basic protocol (mirrors reference Instances) ----
    @property
    def image_size(self) -> Tuple[int, int]:
        return self._image_size

    def set(self, name: str, value: Any) -> None:
        self._fields[name] = value

    def has(self, name: str) -> bool:
        return name in self._fields

    def remove(self, name: str) -> None:
        del self._fields[name]

    def get(self, name: str) -> Any:
        return self._fields[name]

    def get_fields(self) -> Dict[str, Any]:
        return self._fields

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        fields = object.__getattribute__(self, "_fields")
        if name in fields:
            return fields[name]
        raise AttributeError(f"Instances has no field '{name}'; has {sorted(fields)}")

    def __setattr__(self, name: str, value: Any) -> None:
        if name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            self.set(name, value)

    def __len__(self) -> int:
        """Capacity (padded length), NOT the number of valid rows."""
        for v in self._fields.values():
            return int(v.shape[0])
        return 0

    @property
    def valid(self) -> jnp.ndarray:
        if "valid" in self._fields:
            return self._fields["valid"]
        n = len(self)
        return jnp.ones((n,), dtype=bool)

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    def __getitem__(self, item) -> "Instances":
        """Static slicing/gather (int index arrays or slices), capacity changes
        to the indexed length. Boolean-mask selection is NOT supported in-graph
        — clear `valid` instead."""
        out = Instances(self._image_size)
        for k, v in self._fields.items():
            out.set(k, v[item])
        return out

    def replace(self, **updates: Any) -> "Instances":
        out = Instances(self._image_size)
        for k, v in self._fields.items():
            out.set(k, v)
        for k, v in updates.items():
            out.set(k, v)
        return out

    def __repr__(self) -> str:
        return (
            f"Instances(capacity={len(self)}, image_size={self._image_size}, "
            f"fields={ {k: getattr(v, 'shape', None) for k, v in self._fields.items()} })"
        )

    # ---- static-shape helpers ----
    @staticmethod
    def cat(instance_lists) -> "Instances":
        """Concatenate along the capacity axis (reference Instances.cat)."""
        assert len(instance_lists) > 0
        image_size = instance_lists[0].image_size
        keys = set(instance_lists[0]._fields)
        for inst in instance_lists:
            assert set(inst._fields) == keys, "field mismatch in Instances.cat"
        out = Instances(image_size)
        for k in keys:
            out.set(k, jnp.concatenate([inst._fields[k] for inst in instance_lists], axis=0))
        return out

    def pad_to(self, capacity: int) -> "Instances":
        """Pad every field with zeros (and valid with False) up to capacity."""
        n = len(self)
        if n == capacity:
            return self
        assert n < capacity, f"cannot shrink via pad_to ({n} -> {capacity})"
        out = Instances(self._image_size)
        for k, v in self._fields.items():
            pad_width = [(0, capacity - n)] + [(0, 0)] * (v.ndim - 1)
            out.set(k, jnp.pad(v, pad_width))
        if "valid" not in self._fields:
            out.set("valid", jnp.arange(capacity) < n)
        return out


def _is_traced(x) -> bool:
    return any(isinstance(v, jax.core.Tracer) for v in np.atleast_1d(np.array(x, dtype=object)).ravel()) if isinstance(x, (tuple, list)) else isinstance(x, jax.core.Tracer)


def _instances_flatten(inst: Instances):
    keys = sorted(inst._fields)
    children = tuple(inst._fields[k] for k in keys)
    aux = (inst._image_size, tuple(keys))
    return children, aux


def _instances_unflatten(aux, children) -> Instances:
    image_size, keys = aux
    out = Instances(image_size)
    for k, v in zip(keys, children):
        out.set(k, v)
    return out


jax.tree_util.register_pytree_node(Instances, _instances_flatten, _instances_unflatten)

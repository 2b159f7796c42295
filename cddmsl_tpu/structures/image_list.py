"""Batched padded image container, NHWC.

TPU-first replacement for the reference `ImageList`
(detectron2/structures/image_list.py:124 `from_tensors`): a single (B, H, W, C)
array padded to a static bucket size, plus per-image true (h, w). NHWC is the
TPU-native conv layout (the reference uses NCHW).
"""

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ImageList:
    def __init__(self, tensor: jnp.ndarray, image_sizes: jnp.ndarray):
        """tensor: (B, H, W, C); image_sizes: (B, 2) int32 (h, w) true sizes."""
        self.tensor = tensor
        self.image_sizes = image_sizes

    def __len__(self) -> int:
        return self.tensor.shape[0]

    @property
    def padded_size(self) -> Tuple[int, int]:
        return self.tensor.shape[1], self.tensor.shape[2]

    @staticmethod
    def from_tensors(
        tensors: Sequence[np.ndarray],
        size_divisibility: int = 0,
        pad_value: float = 0.0,
        pad_size: Tuple[int, int] = None,
    ) -> "ImageList":
        """Pad a list of (h, w, c) arrays to a common static size.

        Unlike the reference (which pads to the batch max), a `pad_size`
        bucket should be supplied so that shapes are identical across steps
        and the program compiles once.
        """
        assert len(tensors) > 0
        if pad_size is None:
            max_h = max(t.shape[0] for t in tensors)
            max_w = max(t.shape[1] for t in tensors)
            if size_divisibility > 0:
                max_h = int(np.ceil(max_h / size_divisibility) * size_divisibility)
                max_w = int(np.ceil(max_w / size_divisibility) * size_divisibility)
            pad_size = (max_h, max_w)
        H, W = pad_size
        batch = []
        sizes = []
        for t in tensors:
            h, w = t.shape[0], t.shape[1]
            assert h <= H and w <= W, f"image ({h},{w}) larger than pad bucket ({H},{W})"
            padded = np.full((H, W, t.shape[2]), pad_value, dtype=np.asarray(t).dtype)
            padded[:h, :w] = t
            batch.append(padded)
            sizes.append((h, w))
        return ImageList(jnp.asarray(np.stack(batch)), jnp.asarray(np.array(sizes, dtype=np.int32)))


def _imagelist_flatten(il: ImageList):
    return (il.tensor, il.image_sizes), None


def _imagelist_unflatten(aux, children) -> ImageList:
    return ImageList(children[0], children[1])


jax.tree_util.register_pytree_node(ImageList, _imagelist_flatten, _imagelist_unflatten)

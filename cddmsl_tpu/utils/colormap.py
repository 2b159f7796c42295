"""Categorical color palette (reference detectron2/utils/colormap.py:95).

The reference ships a fixed 74-color constant table; here the palette is
generated deterministically — golden-ratio-spaced hues at two
saturation/value rings — which gives the same properties (stable ordering,
high pairwise contrast, defined length) without vendoring the table.
"""

import colorsys

import numpy as np

__all__ = ["colormap", "random_color", "random_colors"]

_N = 74  # reference palette length (colormap.py:14-92)


def _palette():
    cols = []
    for i in range(_N):
        h = (i * 0.61803398875) % 1.0
        s, v = (0.9, 1.0) if i % 2 == 0 else (0.65, 0.85)
        cols.append(colorsys.hsv_to_rgb(h, s, v))
    return np.asarray(cols, dtype=np.float32)  # (N, 3) in [0, 1], RGB


def colormap(rgb=False, maximum=255):
    """(N, 3) float array of colors; BGR unless rgb=True, range [0, maximum]
    (maximum must be 255 or 1) — the reference signature."""
    assert maximum in [255, 1], maximum
    c = _palette() * maximum
    if not rgb:
        c = c[:, ::-1]
    return c


def random_color(rgb=False, maximum=255):
    """One random palette color (reference colormap.py:111)."""
    idx = np.random.randint(0, _N)
    return colormap(rgb=rgb, maximum=maximum)[idx]


def random_colors(N, rgb=False, maximum=255):
    """N random palette colors (reference colormap.py:125)."""
    indices = np.random.randint(0, _N, size=N)
    return colormap(rgb=rgb, maximum=maximum)[indices]

"""Host-side (numpy) mask utilities for COCO segm evaluation.

Replaces the reference's pycocotools mask API (used by
detectron2/evaluation/coco_evaluation.py through `maskUtils.encode/iou` and
structures/masks.py `polygons_to_bitmask`) — pycocotools is not available in
this environment, so the uncompressed COCO RLE codec, polygon
rasterization, mask pasting and mask IoU are implemented directly.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], np.int64)


def paste_masks_np(
    masks: np.ndarray,  # (N, M, M) probabilities in box space
    boxes: np.ndarray,  # (N, 4) XYXY image coords
    image_hw: Tuple[int, int],
    threshold: float = 0.5,
) -> np.ndarray:
    """Numpy mirror of models/mask_head.py paste_masks_in_image (reference
    layers/mask_ops.py _do_paste_mask): inverse bilinear sampling with exact
    grid_sample(align_corners=False, padding_mode='zeros') semantics —
    unclamped sample coordinates (out-of-range taps contribute zero) and
    `>= threshold` binarization (mask_ops.py:137)."""
    H, W = int(image_hw[0]), int(image_hw[1])
    n, m, _ = masks.shape
    out = np.zeros((n, H, W), bool)
    if n == 0:
        return out
    # native kernel (csrc/maskops.cpp): same math, but only the in-box pixel
    # window per instance — the numpy mirror below evaluates the full grid
    from ..csrc.build import load_native

    native = load_native("maskops")
    if native is not None:
        import ctypes

        buf = np.zeros((n, H, W), np.uint8)
        native.paste_masks(
            ctypes.c_longlong(n), ctypes.c_longlong(m),
            ctypes.c_longlong(H), ctypes.c_longlong(W),
            np.ascontiguousarray(masks, np.float32).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.ascontiguousarray(boxes, np.float64).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_double(threshold),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return buf.view(bool)
    ys_img = np.arange(H) + 0.5
    xs_img = np.arange(W) + 0.5

    def _taps(s):
        i0 = np.floor(s).astype(np.int64)
        f = s - i0
        w0 = (1 - f) * ((i0 >= 0) & (i0 <= m - 1))
        w1 = f * ((i0 + 1 >= 0) & (i0 + 1 <= m - 1))
        return np.clip(i0, 0, m - 1), w0, np.clip(i0 + 1, 0, m - 1), w1

    for i in range(n):
        x1, y1, x2, y2 = boxes[i]
        w = max(x2 - x1, 1e-3)
        h = max(y2 - y1, 1e-3)
        r0, wy0, r1, wy1 = _taps((ys_img - y1) / h * m - 0.5)
        c0, wx0, c1, wx1 = _taps((xs_img - x1) / w * m - 0.5)
        mk = masks[i]
        v = (
            mk[r0][:, c0] * wy0[:, None] * wx0[None, :]
            + mk[r0][:, c1] * wy0[:, None] * wx1[None, :]
            + mk[r1][:, c0] * wy1[:, None] * wx0[None, :]
            + mk[r1][:, c1] * wy1[:, None] * wx1[None, :]
        )
        out[i] = v >= threshold
    return out


def polygons_to_bitmask(polygons: Sequence[np.ndarray], hw: Tuple[int, int]) -> np.ndarray:
    """Polygon rings (each (P, 2) float xy) -> (H, W) bool bitmask via PIL
    (reference structures/masks.py polygons_to_bitmask uses pycocotools)."""
    from PIL import Image, ImageDraw

    H, W = int(hw[0]), int(hw[1])
    img = Image.new("L", (W, H), 0)
    draw = ImageDraw.Draw(img)
    for ring in polygons:
        pts = [(float(x), float(y)) for x, y in np.asarray(ring, np.float64).reshape(-1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, fill=1)
    return np.asarray(img, bool)


def coco_rle_to_bitmask(rle: Dict) -> np.ndarray:
    """COCO RLE dict (uncompressed list counts OR compressed-string counts,
    the pycocotools frUncompressedRLE/decode formats) -> (H, W) bool."""
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, bytes):
            counts = counts.decode("ascii")
        counts = _decode_compressed_counts(counts)
    return rle_decode({"size": rle["size"], "counts": list(counts)})


def _decode_compressed_counts(s: str) -> List[int]:
    """pycocotools' modified-LEB128 string encoding of run lengths."""
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def segmentation_to_rle(seg, image_hw) -> Dict:
    """Any COCO 'segmentation' field -> our uncompressed RLE:
    polygon list, RLE dict (either counts form), or (H, W) array."""
    if seg is None:
        return rle_encode(np.zeros((int(image_hw[0]), int(image_hw[1])), bool))
    if isinstance(seg, dict):
        return rle_encode(coco_rle_to_bitmask(seg))
    if isinstance(seg, np.ndarray):
        return rle_encode(seg.astype(bool))
    # list of polygon rings
    return rle_encode(
        polygons_to_bitmask([np.asarray(p, np.float64).reshape(-1, 2) for p in seg], image_hw)
    )


# ---------------- uncompressed COCO RLE (column-major) ----------------
def rle_encode(mask: np.ndarray) -> Dict:
    """(H, W) bool -> {'size': [H, W], 'counts': [int, ...]} — COCO
    uncompressed RLE: column-major scan, alternating run lengths starting
    with the count of 0s."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)  # column-major
    if flat.size == 0:
        return {"size": [h, w], "counts": [0]}
    change = np.nonzero(np.diff(flat))[0] + 1
    runs = np.diff(np.concatenate([[0], change, [flat.size]])).tolist()
    if flat[0]:  # counts must start with a zero-run
        runs = [0] + runs
    return {"size": [h, w], "counts": runs}


def rle_decode(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for run in rle["counts"]:
        if val:
            flat[pos : pos + run] = True
        pos += run
        val = not val
    return flat.reshape(w, h).T


def rle_area(rle: Dict) -> int:
    return int(sum(rle["counts"][1::2]))


def mask_iou_matrix(
    det_rles: List[Dict], gt_rles: List[Dict], iscrowd: np.ndarray
) -> np.ndarray:
    """(D,), (G,) RLEs -> (D, G) mask IoU; crowd GT uses
    intersection-over-det-area (pycocotools maskUtils.iou semantics)."""
    d, g = len(det_rles), len(gt_rles)
    if d == 0 or g == 0:
        return np.zeros((d, g))
    dm = np.stack([np.packbits(rle_decode(r).reshape(-1)) for r in det_rles])  # (D, B)
    gm = np.stack([np.packbits(rle_decode(r).reshape(-1)) for r in gt_rles])
    area_d = np.array([rle_area(r) for r in det_rles], np.float64)
    area_g = np.array([rle_area(r) for r in gt_rles], np.float64)
    inter = np.zeros((d, g), np.float64)
    for j in range(g):
        inter[:, j] = _POPCOUNT[np.bitwise_and(dm, gm[j][None, :])].sum(axis=1)
    union = area_d[:, None] + area_g[None, :] - inter
    union = np.where(np.asarray(iscrowd, bool)[None, :], area_d[:, None], union)
    return np.where(union > 0, inter / np.maximum(union, 1e-10), 0.0)

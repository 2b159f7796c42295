"""Detection visualization (reference detectron2/utils/visualizer.py:1219).
PIL-based, no matplotlib dependency. Covers the reference surface the tools
use: instance boxes/labels, instance masks (bitmask or polygon overlay),
keypoints (+skeleton from metadata), semantic / panoptic segmentation
overlays, and dataset-dict GT drawing."""

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw

from .colormap import colormap as _colormap

_PALETTE = None


def _color(i: int) -> Tuple[int, int, int]:
    """Category color from the shared palette (utils/colormap.py — one
    palette for all drawing, r3 ADVICE item 1)."""
    global _PALETTE
    if _PALETTE is None:
        _PALETTE = _colormap(rgb=True, maximum=255).astype(np.int32)
    r, g, b = _PALETTE[i % len(_PALETTE)]
    return int(r), int(g), int(b)


# COCO-person skeleton (reference builtin_meta.py KEYPOINT_CONNECTION_RULES
# pairs, by keypoint index)
COCO_PERSON_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


class Visualizer:
    def __init__(self, img_rgb: np.ndarray, metadata=None, scale: float = 1.0):
        self.img = Image.fromarray(np.asarray(img_rgb, np.uint8)).convert("RGB")
        if scale != 1.0:
            self.img = self.img.resize(
                (int(self.img.width * scale), int(self.img.height * scale))
            )
        self.scale = scale
        self.metadata = metadata
        self.draw = ImageDraw.Draw(self.img, "RGBA")

    def _label(self, cls: int) -> str:
        names = self.metadata.get("thing_classes") if self.metadata else None
        return names[cls] if names and 0 <= cls < len(names) else str(cls)

    # ---------------- instances ----------------
    def draw_instance_predictions(
        self,
        boxes: np.ndarray,
        scores: Optional[np.ndarray] = None,
        classes: Optional[np.ndarray] = None,
        valid: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,  # (N, H, W) image-space {0,1}
        keypoints: Optional[np.ndarray] = None,  # (N, K, 3) (x, y, score)
        assigned_colors: Optional[List[Tuple[int, int, int]]] = None,
    ) -> Image.Image:
        n = len(boxes)
        for i in range(n):
            if valid is not None and not valid[i]:
                continue
            cls = int(classes[i]) if classes is not None else 0
            color = assigned_colors[i] if assigned_colors else _color(cls)
            if masks is not None:
                self.draw_binary_mask(np.asarray(masks[i]), color)
            x1, y1, x2, y2 = (np.asarray(boxes[i], np.float64) * self.scale).tolist()
            self.draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
            text = self._label(cls)
            if scores is not None:
                text += f" {float(scores[i]):.0%}"
            self.draw.text((x1 + 2, max(y1 - 11, 0)), text, fill=color)
            if keypoints is not None:
                self.draw_keypoints(np.asarray(keypoints[i]), color)
        return self.img

    def draw_binary_mask(
        self, mask: np.ndarray, color: Tuple[int, int, int], alpha: float = 0.45
    ) -> Image.Image:
        """Overlay a (H, W) {0,1} mask (reference draw_binary_mask)."""
        m = np.asarray(mask)
        if self.scale != 1.0:
            m = np.asarray(
                Image.fromarray((m > 0.5).astype(np.uint8) * 255).resize(
                    (self.img.width, self.img.height), Image.NEAREST
                )
            ) > 127
        overlay = np.zeros((self.img.height, self.img.width, 4), np.uint8)
        mm = (m > 0.5)[: self.img.height, : self.img.width]
        overlay[mm] = (*color, int(alpha * 255))
        self.img.paste(Image.fromarray(overlay, "RGBA"), (0, 0), Image.fromarray(overlay, "RGBA"))
        self.draw = ImageDraw.Draw(self.img, "RGBA")
        return self.img

    def draw_polygon(
        self, polygon: np.ndarray, color: Tuple[int, int, int], alpha: float = 0.45
    ) -> Image.Image:
        """(P, 2) polygon ring in image coords (reference draw_polygon)."""
        pts = [tuple(p * self.scale) for p in np.asarray(polygon, np.float64)]
        self.draw.polygon(pts, fill=(*color, int(alpha * 255)), outline=color)
        return self.img

    def draw_keypoints(
        self, kps: np.ndarray, color: Tuple[int, int, int], radius: int = 2,
        thresh: float = 0.05,
    ) -> Image.Image:
        """(K, 3) (x, y, score-or-vis) keypoints + skeleton when the
        metadata (or COCO-17 shape) defines connection rules (reference
        draw_and_connect_keypoints)."""
        kps = np.asarray(kps, np.float64)
        vis = kps[:, 2] > thresh
        skeleton = []
        if self.metadata is not None and self.metadata.get("keypoint_connection_rules"):
            names = list(self.metadata.get("keypoint_names") or ())
            for a, b, *_ in self.metadata.get("keypoint_connection_rules"):
                if a in names and b in names:
                    skeleton.append((names.index(a), names.index(b)))
        elif len(kps) == 17:
            skeleton = COCO_PERSON_SKELETON
        for a, b in skeleton:
            if a < len(kps) and b < len(kps) and vis[a] and vis[b]:
                self.draw.line(
                    [tuple(kps[a, :2] * self.scale), tuple(kps[b, :2] * self.scale)],
                    fill=color, width=1,
                )
        for k in range(len(kps)):
            if vis[k]:
                x, y = kps[k, :2] * self.scale
                self.draw.ellipse(
                    [x - radius, y - radius, x + radius, y + radius], fill=(255, 0, 0)
                )
        return self.img

    # ---------------- segmentation ----------------
    def draw_sem_seg(
        self, sem_seg: np.ndarray, alpha: float = 0.45, ignore_label: int = 255
    ) -> Image.Image:
        """(H, W) int class map overlay (reference draw_sem_seg)."""
        sem = np.asarray(sem_seg)
        overlay = np.zeros((*sem.shape, 4), np.uint8)
        for c in np.unique(sem):
            if c == ignore_label:
                continue
            overlay[sem == c] = (*_color(int(c)), int(alpha * 255))
        ov = Image.fromarray(overlay, "RGBA").resize((self.img.width, self.img.height), Image.NEAREST)
        self.img.paste(ov, (0, 0), ov)
        self.draw = ImageDraw.Draw(self.img, "RGBA")
        return self.img

    def draw_panoptic_seg(
        self, panoptic_seg: np.ndarray, segments_info: Sequence[dict], alpha: float = 0.45
    ) -> Image.Image:
        """(H, W) segment-id map + segments_info (reference
        draw_panoptic_seg): things get per-instance colors, stuff per-class."""
        pan = np.asarray(panoptic_seg)
        overlay = np.zeros((*pan.shape, 4), np.uint8)
        for seg in segments_info:
            sid = seg["id"]
            color = _color(1000 + sid) if seg.get("isthing") else _color(seg.get("category_id", sid))
            overlay[pan == sid] = (*color, int(alpha * 255))
        ov = Image.fromarray(overlay, "RGBA").resize((self.img.width, self.img.height), Image.NEAREST)
        self.img.paste(ov, (0, 0), ov)
        self.draw = ImageDraw.Draw(self.img, "RGBA")
        return self.img

    # ---------------- dataset dicts ----------------
    def draw_dataset_dict(self, dataset_dict: dict) -> Image.Image:
        annos = dataset_dict.get("annotations", [])
        boxes = np.array([a["bbox"] for a in annos]).reshape(-1, 4)
        classes = np.array([a["category_id"] for a in annos], int)
        for a in annos:
            segs = a.get("segmentation")
            if isinstance(segs, list):
                for seg in segs:
                    pts = np.asarray(seg, np.float64).reshape(-1, 2)
                    if len(pts) >= 3:
                        self.draw_polygon(pts, _color(int(a["category_id"])))
        kps = None
        if any(a.get("keypoints") for a in annos):
            kps = np.stack(
                [np.asarray(a.get("keypoints", [0, 0, 0]), np.float64).reshape(-1, 3) for a in annos]
            )
        return self.draw_instance_predictions(boxes, None, classes, keypoints=kps)

    def get_output(self) -> Image.Image:
        return self.img


class VideoVisualizer:
    """Frame-to-frame consistent instance colors (reference
    utils/video_visualizer.py:235): instances are matched to the previous
    frame by bbox IoU + same class; matched instances keep their color."""

    def __init__(self, metadata=None, iou_thresh: float = 0.5):
        self.metadata = metadata
        self.iou_thresh = iou_thresh
        self._prev_boxes = np.zeros((0, 4))
        self._prev_classes = np.zeros((0,), int)
        self._prev_colors: List[Tuple[int, int, int]] = []
        self._next_color = 0

    def _fresh_color(self):
        c = _color(self._next_color)
        self._next_color += 1
        return c

    def draw_instance_predictions(
        self, frame_rgb: np.ndarray, boxes, scores=None, classes=None, valid=None,
        masks=None, keypoints=None,
    ) -> Image.Image:
        boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
        classes = (
            np.asarray(classes, int).reshape(-1) if classes is not None else np.zeros(len(boxes), int)
        )
        if valid is not None:
            keep = np.asarray(valid, bool)
            boxes, classes = boxes[keep], classes[keep]
            scores = np.asarray(scores)[keep] if scores is not None else None
            masks = np.asarray(masks)[keep] if masks is not None else None
            keypoints = np.asarray(keypoints)[keep] if keypoints is not None else None
        colors = []
        used = set()
        for i in range(len(boxes)):
            best, best_iou = -1, self.iou_thresh
            for j in range(len(self._prev_boxes)):
                if j in used or self._prev_classes[j] != classes[i]:
                    continue
                lt = np.maximum(boxes[i, :2], self._prev_boxes[j, :2])
                rb = np.minimum(boxes[i, 2:], self._prev_boxes[j, 2:])
                wh = np.clip(rb - lt, 0, None)
                inter = wh[0] * wh[1]
                ua = (
                    (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                    + (self._prev_boxes[j, 2] - self._prev_boxes[j, 0])
                    * (self._prev_boxes[j, 3] - self._prev_boxes[j, 1])
                    - inter
                )
                iou = inter / ua if ua > 0 else 0.0
                if iou > best_iou:
                    best, best_iou = j, iou
            if best >= 0:
                used.add(best)
                colors.append(self._prev_colors[best])
            else:
                colors.append(self._fresh_color())
        vis = Visualizer(frame_rgb, self.metadata)
        out = vis.draw_instance_predictions(
            boxes, scores, classes, masks=masks, keypoints=keypoints, assigned_colors=colors
        )
        self._prev_boxes, self._prev_classes, self._prev_colors = boxes, classes, colors
        return out

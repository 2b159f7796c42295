"""Detection visualization (reference detectron2/utils/visualizer.py:1219 —
the subset CDDMSL uses: draw predicted/GT boxes with class labels and scores
onto an image). PIL-based, no matplotlib dependency."""

import colorsys
from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def _color(i: int):
    h = (i * 0.61803398875) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.9, 1.0)
    return int(r * 255), int(g * 255), int(b * 255)


class Visualizer:
    def __init__(self, img_rgb: np.ndarray, metadata=None, scale: float = 1.0):
        self.img = Image.fromarray(np.asarray(img_rgb, np.uint8)).convert("RGB")
        if scale != 1.0:
            self.img = self.img.resize(
                (int(self.img.width * scale), int(self.img.height * scale))
            )
        self.scale = scale
        self.metadata = metadata
        self.draw = ImageDraw.Draw(self.img)

    def _label(self, cls: int) -> str:
        names = self.metadata.get("thing_classes") if self.metadata else None
        return names[cls] if names and 0 <= cls < len(names) else str(cls)

    def draw_instance_predictions(
        self,
        boxes: np.ndarray,
        scores: Optional[np.ndarray] = None,
        classes: Optional[np.ndarray] = None,
        valid: Optional[np.ndarray] = None,
    ) -> Image.Image:
        n = len(boxes)
        for i in range(n):
            if valid is not None and not valid[i]:
                continue
            x1, y1, x2, y2 = (np.asarray(boxes[i]) * self.scale).tolist()
            cls = int(classes[i]) if classes is not None else 0
            color = _color(cls)
            self.draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
            text = self._label(cls)
            if scores is not None:
                text += f" {float(scores[i]):.0%}"
            self.draw.text((x1 + 2, max(y1 - 11, 0)), text, fill=color)
        return self.img

    def draw_dataset_dict(self, dataset_dict: dict) -> Image.Image:
        annos = dataset_dict.get("annotations", [])
        boxes = np.array([a["bbox"] for a in annos]).reshape(-1, 4)
        classes = np.array([a["category_id"] for a in annos], int)
        return self.draw_instance_predictions(boxes, None, classes)

    def get_output(self) -> Image.Image:
        return self.img

"""Host-side (numpy/PIL) geometric + photometric transforms.

Mirrors the reference transform stack (detectron2/data/transforms/):
deterministic `Transform` objects (replayable on the paired translated view
and on boxes — the core requirement of the paired-domain mapper,
dataset_mapper.py:159-161) sampled by `Augmentation` objects, plus the
SimCLR-style strong augmentation of detection_utils.py:617-653.
"""

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image, ImageFilter


# ---------------- deterministic transforms ----------------
class Transform:
    def apply_image(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        """boxes: (N, 4) XYXY float."""
        raise NotImplementedError

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        """coords: (N, 2) float (x, y) points (for polygons/keypoints)."""
        raise NotImplementedError

    def apply_segmentation(self, seg: np.ndarray) -> np.ndarray:
        """(H, W) integer label map; geometric transforms resample NEAREST
        (reference transform.py apply_segmentation)."""
        return self.apply_image(seg)


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_segmentation(self, seg):
        return seg

    def apply_box(self, boxes):
        return boxes

    def apply_coords(self, coords):
        return coords


class ResizeTransform(Transform):
    def __init__(self, h: int, w: int, new_h: int, new_w: int, interp=Image.BILINEAR):
        self.h, self.w, self.new_h, self.new_w, self.interp = h, w, new_h, new_w, interp

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        assert img.shape[:2] == (self.h, self.w), (img.shape, self.h, self.w)
        pil = Image.fromarray(img.astype(np.uint8))
        resized = pil.resize((self.new_w, self.new_h), self.interp)
        return np.asarray(resized)

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        boxes = boxes.astype(np.float32).copy()
        boxes[:, 0::2] *= self.new_w / self.w
        boxes[:, 1::2] *= self.new_h / self.h
        return boxes

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = coords.astype(np.float32).copy()
        coords[:, 0] *= self.new_w / self.w
        coords[:, 1] *= self.new_h / self.h
        return coords

    def apply_segmentation(self, seg: np.ndarray) -> np.ndarray:
        pil = Image.fromarray(seg.astype(np.int32), mode="I")
        return np.asarray(pil.resize((self.new_w, self.new_h), Image.NEAREST))


class HFlipTransform(Transform):
    def __init__(self, width: int):
        self.width = width

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(img[:, ::-1])

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        boxes = boxes.astype(np.float32).copy()
        x1 = self.width - boxes[:, 2]
        x2 = self.width - boxes[:, 0]
        boxes[:, 0], boxes[:, 2] = x1, x2
        return boxes

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = coords.astype(np.float32).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords


class CropTransform(Transform):
    def __init__(self, x0: int, y0: int, w: int, h: int):
        self.x0, self.y0, self.w, self.h = x0, y0, w, h

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        return img[self.y0 : self.y0 + self.h, self.x0 : self.x0 + self.w]

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        boxes = boxes.astype(np.float32).copy()
        boxes[:, 0::2] -= self.x0
        boxes[:, 1::2] -= self.y0
        return boxes

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = coords.astype(np.float32).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords


class PadTransform(Transform):
    """Pad left/top by (x0, y0) and right/bottom by (x1, y1) (reference
    transform.py PadTransform): boxes/coords shift by the top-left pad;
    segmentation pads with `seg_pad_value` (ignore label)."""

    def __init__(self, x0: int, y0: int, x1: int, y1: int,
                 pad_value: float = 128.0, seg_pad_value: int = 255):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.pad_value = pad_value
        self.seg_pad_value = seg_pad_value

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        pads = [(self.y0, self.y1), (self.x0, self.x1)] + [(0, 0)] * (img.ndim - 2)
        return np.pad(img, pads, constant_values=self.pad_value).astype(img.dtype)

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        boxes = boxes.astype(np.float32).copy()
        boxes[:, 0::2] += self.x0
        boxes[:, 1::2] += self.y0
        return boxes

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = coords.astype(np.float32).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords

    def apply_segmentation(self, seg: np.ndarray) -> np.ndarray:
        pads = [(self.y0, self.y1), (self.x0, self.x1)]
        return np.pad(seg, pads, constant_values=self.seg_pad_value).astype(seg.dtype)


class TransformList(Transform):
    def __init__(self, tfms: Sequence[Transform]):
        self.transforms = list(tfms)

    def apply_segmentation(self, seg):
        for t in self.transforms:
            seg = t.apply_segmentation(seg)
        return seg

    def apply_image(self, img):
        for t in self.transforms:
            img = t.apply_image(img)
        return img

    def apply_box(self, boxes):
        for t in self.transforms:
            boxes = t.apply_box(boxes)
        return boxes

    def apply_coords(self, coords):
        for t in self.transforms:
            coords = t.apply_coords(coords)
        return coords


# ---------------- augmentations (random samplers of transforms) ----------------
class Augmentation:
    def get_transform(self, img: np.ndarray, rng: np.random.RandomState) -> Transform:
        raise NotImplementedError


class ResizeShortestEdge(Augmentation):
    """Scale the shorter side to one of `short_edge_length`, cap the longer
    side at `max_size` (reference augmentation_impl.py ResizeShortestEdge)."""

    def __init__(
        self,
        short_edge_length: Union[int, Sequence[int]],
        max_size: int = 1333,
        sample_style: str = "choice",
    ):
        if isinstance(short_edge_length, int):
            short_edge_length = (short_edge_length, short_edge_length)
        self.short_edge_length = tuple(short_edge_length)
        self.max_size = max_size
        self.sample_style = sample_style

    def get_transform(self, img, rng) -> Transform:
        h, w = img.shape[:2]
        if self.sample_style == "range":
            size = rng.randint(min(self.short_edge_length), max(self.short_edge_length) + 1)
        else:
            size = self.short_edge_length[rng.randint(len(self.short_edge_length))]
        if size == 0:
            return NoOpTransform()
        scale = size / min(h, w)
        if h < w:
            new_h, new_w = size, int(round(w * scale))
        else:
            new_h, new_w = int(round(h * scale)), size
        if max(new_h, new_w) > self.max_size:
            scale2 = self.max_size / max(new_h, new_w)
            new_h, new_w = int(round(new_h * scale2)), int(round(new_w * scale2))
        return ResizeTransform(h, w, new_h, new_w)


class RandomFlip(Augmentation):
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def get_transform(self, img, rng) -> Transform:
        if rng.rand() < self.prob:
            return HFlipTransform(img.shape[1])
        return NoOpTransform()


class RandomCrop(Augmentation):
    """Random sub-crop (reference augmentation_impl.py RandomCrop): crop_type
    in {relative, relative_range, absolute, absolute_range}."""

    def __init__(self, crop_type: str, crop_size: Sequence[float]):
        assert crop_type in ("relative", "relative_range", "absolute", "absolute_range"), crop_type
        self.crop_type = crop_type
        self.crop_size = tuple(crop_size)

    def _crop_hw(self, h: int, w: int, rng) -> Tuple[int, int]:
        ch, cw = self.crop_size
        if self.crop_type == "relative":
            return int(h * ch + 0.5), int(w * cw + 0.5)
        if self.crop_type == "relative_range":
            lo = np.asarray(self.crop_size, np.float32)
            ch, cw = lo + rng.rand(2) * (1 - lo)
            return int(h * ch + 0.5), int(w * cw + 0.5)
        if self.crop_type == "absolute":
            return min(h, int(ch)), min(w, int(cw))
        # absolute_range
        return (
            rng.randint(min(h, int(ch)), min(h, int(cw)) + 1),
            rng.randint(min(w, int(ch)), min(w, int(cw)) + 1),
        )

    def get_transform(self, img, rng) -> Transform:
        h, w = img.shape[:2]
        ch, cw = self._crop_hw(h, w, rng)
        y0 = rng.randint(h - ch + 1)
        x0 = rng.randint(w - cw + 1)
        return CropTransform(x0, y0, cw, ch)


class ResizeScale(Augmentation):
    """Large-scale jitter resize (reference augmentation_impl.py ResizeScale,
    the 'LSJ' recipe of configs/new_baselines): sample scale in
    [min_scale, max_scale], then resize the image to fit within
    (target_height, target_width) * scale, preserving aspect ratio."""

    def __init__(self, min_scale: float, max_scale: float,
                 target_height: int, target_width: int):
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.target_height = target_height
        self.target_width = target_width

    def get_transform(self, img, rng) -> Transform:
        h, w = img.shape[:2]
        scale = rng.uniform(self.min_scale, self.max_scale)
        out_scale = min(self.target_height * scale / h, self.target_width * scale / w)
        new_h = int(round(h * out_scale))
        new_w = int(round(w * out_scale))
        if (new_h, new_w) == (h, w):
            return NoOpTransform()
        return ResizeTransform(h, w, new_h, new_w)


class FixedSizeCrop(Augmentation):
    """Crop (random position) and/or pad bottom-right to a FIXED output size
    (reference augmentation_impl.py FixedSizeCrop — the LSJ companion):
    larger inputs are randomly cropped, smaller ones padded with
    `pad_value` (images) / `seg_pad_value` (segmentation ignore)."""

    def __init__(self, crop_size: Tuple[int, int], pad: bool = True,
                 pad_value: float = 128.0, seg_pad_value: int = 255):
        self.crop_size = tuple(crop_size)
        self.pad = pad
        self.pad_value = pad_value
        self.seg_pad_value = seg_pad_value

    def get_transform(self, img, rng) -> Transform:
        h, w = img.shape[:2]
        ch, cw = self.crop_size
        oy = int(round(rng.uniform(0.0, 1.0) * max(0, h - ch)))
        ox = int(round(rng.uniform(0.0, 1.0) * max(0, w - cw)))
        tfms: List[Transform] = [CropTransform(ox, oy, min(cw, w - ox), min(ch, h - oy))]
        if self.pad:
            pad_x1 = max(0, cw - (w - ox))
            pad_y1 = max(0, ch - (h - oy))
            if pad_x1 or pad_y1:
                tfms.append(
                    PadTransform(0, 0, pad_x1, pad_y1, self.pad_value, self.seg_pad_value)
                )
        return tfms[0] if len(tfms) == 1 else TransformList(tfms)


def build_augmentation(cfg, is_train: bool) -> List[Augmentation]:
    """reference detection_utils.py:590-614 (+ the RandomCrop insertion of
    dataset_mapper.py when INPUT.CROP.ENABLED)."""
    if is_train:
        augs: List[Augmentation] = [
            ResizeShortestEdge(
                tuple(cfg.INPUT.MIN_SIZE_TRAIN),
                cfg.INPUT.MAX_SIZE_TRAIN,
                cfg.INPUT.MIN_SIZE_TRAIN_SAMPLING,
            )
        ]
        if cfg.INPUT.CROP.ENABLED:
            augs.insert(0, RandomCrop(cfg.INPUT.CROP.TYPE, cfg.INPUT.CROP.SIZE))
        if cfg.INPUT.RANDOM_FLIP != "none":
            augs.append(RandomFlip(0.5))
        return augs
    return [ResizeShortestEdge(cfg.INPUT.MIN_SIZE_TEST, cfg.INPUT.MAX_SIZE_TEST)]


def apply_augmentations(
    augs: Sequence[Augmentation], img: np.ndarray, rng: np.random.RandomState
) -> Tuple[np.ndarray, TransformList]:
    tfms = []
    for aug in augs:
        t = aug.get_transform(img, rng)
        img = t.apply_image(img)
        tfms.append(t)
    return img, TransformList(tfms)


# ---------------- strong (photometric) augmentation ----------------
def _color_jitter(img: np.ndarray, rng, brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1):
    x = img.astype(np.float32)
    order = rng.permutation(4)
    for op in order:
        if op == 0:  # brightness
            x = x * rng.uniform(1 - brightness, 1 + brightness)
        elif op == 1:  # contrast
            mean = x.mean()
            x = (x - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
        elif op == 2:  # saturation
            gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
            f = rng.uniform(1 - saturation, 1 + saturation)
            x = x * f + gray[..., None] * (1 - f)
        else:  # hue (cheap approximation: channel rotation mix)
            f = rng.uniform(-hue, hue)
            if abs(f) > 1e-3:
                x = x + np.roll(x, 1, axis=-1) * f - x * f
    return np.clip(x, 0, 255)


def build_strong_augmentation_fn():
    """SimCLR-flavored pipeline of the reference
    (detection_utils.py:617-653): ColorJitter(.4,.4,.4,.1)@p.8,
    RandomGrayscale@.2, GaussianBlur(sigma .1-2)@.5, then 3x RandomErasing
    (p .7/.5/.3). Returns fn(img_uint8, rng) -> img_uint8."""

    def strong_aug(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        x = img.astype(np.float32)
        if rng.rand() < 0.8:
            x = _color_jitter(x, rng)
        if rng.rand() < 0.2:
            gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
            x = np.repeat(gray[..., None], 3, axis=-1)
        if rng.rand() < 0.5:
            sigma = rng.uniform(0.1, 2.0)
            pil = Image.fromarray(np.clip(x, 0, 255).astype(np.uint8))
            x = np.asarray(pil.filter(ImageFilter.GaussianBlur(radius=sigma))).astype(np.float32)
        # RandomErasing x3 (torchvision semantics: scale (.02,.33)/(.05,.2)/(.02,.2))
        for p, scale_rng, value_random in ((0.7, (0.05, 0.2), True), (0.5, (0.02, 0.2), True), (0.3, (0.02, 0.2), True)):
            if rng.rand() < p:
                h, w = x.shape[:2]
                for _ in range(10):
                    area = rng.uniform(*scale_rng) * h * w
                    ratio = np.exp(rng.uniform(np.log(0.3), np.log(3.3)))
                    eh, ew = int(round(np.sqrt(area * ratio))), int(round(np.sqrt(area / ratio)))
                    if eh < h and ew < w:
                        y0, x0 = rng.randint(0, h - eh), rng.randint(0, w - ew)
                        x[y0 : y0 + eh, x0 : x0 + ew] = rng.rand(eh, ew, 3) * 255 if value_random else 0
                        break
        return np.clip(x, 0, 255).astype(np.uint8)

    return strong_aug


def exp_rampup(current: float, rampup_length: float) -> float:
    """Exponential rampup (reference detection_utils.py:693, imported by
    train_net.py:46 for the mean-teacher loss weight)."""
    if rampup_length == 0:
        return 1.0
    current = np.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    if rampup_length == 0:
        return 1.0
    current = np.clip(current, 0.0, rampup_length)
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


def linear_rampup(current: float, rampup_length: float) -> float:
    if rampup_length == 0:
        return 1.0
    return float(np.clip(current / rampup_length, 0.0, 1.0))


def cosine_rampdown(current: float, rampdown_length: float) -> float:
    return float(0.5 * (np.cos(np.pi * current / rampdown_length) + 1))


# ---------------- extended transform family (reference transform.py:351 ----
# RotationTransform / ExtentTransform / BlendTransform and the color
# augmentations of augmentation_impl.py: RandomBrightness / RandomContrast /
# RandomSaturation / RandomLighting) ----------------


class RotationTransform(Transform):
    """Rotate by `angle` degrees around the image center, optionally
    expanding the canvas to fit (reference transforms/transform.py
    RotationTransform). Coordinates rotate exactly; boxes become the
    axis-aligned hull of their rotated corners (reference apply_box via
    apply_coords on the 4 corners)."""

    def __init__(self, h: int, w: int, angle: float, expand: bool = True, interp=Image.BILINEAR):
        self.h, self.w, self.angle, self.expand, self.interp = h, w, angle, expand, interp
        rad = np.deg2rad(angle)
        self.cos, self.sin = np.cos(rad), np.sin(rad)
        if expand:
            # replicate PIL.Image.rotate(expand=True): transform the four
            # corners around the center and take ceil(max) - floor(min) per
            # axis — PIL then re-centers, so center maps to center and
            # apply_coords below stays exact
            import math

            cx, cy = w / 2.0, h / 2.0
            xs, ys = [], []
            for x, y in ((0, 0), (w, 0), (w, h), (0, h)):
                dx, dy = x - cx, y - cy
                # round kills float fuzz (cos(90deg) ~ 6e-17) so exact
                # multiples of 90 — which PIL special-cases as transposes —
                # get the exact transpose canvas
                xs.append(round(self.cos * dx + self.sin * dy + cx, 8))
                ys.append(round(-self.sin * dx + self.cos * dy + cy, 8))
            self.new_w = math.ceil(max(xs)) - math.floor(min(xs))
            self.new_h = math.ceil(max(ys)) - math.floor(min(ys))
        else:
            self.new_w, self.new_h = w, h

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        pil = Image.fromarray(img.astype(np.uint8))
        out = pil.rotate(self.angle, resample=self.interp, expand=self.expand)
        return np.asarray(out)

    def apply_segmentation(self, seg: np.ndarray) -> np.ndarray:
        pil = Image.fromarray(seg.astype(np.int32), mode="I")
        return np.asarray(pil.rotate(self.angle, resample=Image.NEAREST, expand=self.expand))

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        coords = coords.astype(np.float32).copy()
        cx, cy = self.w / 2, self.h / 2
        ncx, ncy = self.new_w / 2, self.new_h / 2
        x = coords[:, 0] - cx
        y = coords[:, 1] - cy
        # PIL rotates counter-clockwise for positive angles; image y is down
        xr = x * self.cos + y * self.sin
        yr = -x * self.sin + y * self.cos
        return np.stack([xr + ncx, yr + ncy], axis=1)

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        boxes = boxes.astype(np.float32)
        if len(boxes) == 0:
            return boxes
        corners = np.stack(
            [boxes[:, [0, 1]], boxes[:, [2, 1]], boxes[:, [0, 3]], boxes[:, [2, 3]]], axis=1
        ).reshape(-1, 2)
        rc = self.apply_coords(corners).reshape(-1, 4, 2)
        out = np.concatenate([rc.min(axis=1), rc.max(axis=1)], axis=1)
        return out


class ExtentTransform(Transform):
    """Resample a sub-rectangle (src_rect, may exceed the image) to a fixed
    output size (reference ExtentTransform via PIL Image.EXTENT)."""

    def __init__(self, src_rect, output_size, interp=Image.BILINEAR):
        self.src_rect = tuple(float(v) for v in src_rect)  # x0, y0, x1, y1
        self.output_size = tuple(int(v) for v in output_size)  # (h, w)
        self.interp = interp

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        h, w = self.output_size
        pil = Image.fromarray(img.astype(np.uint8))
        out = pil.transform((w, h), Image.EXTENT, self.src_rect, self.interp)
        return np.asarray(out)

    def apply_segmentation(self, seg: np.ndarray) -> np.ndarray:
        h, w = self.output_size
        pil = Image.fromarray(seg.astype(np.int32), mode="I")
        return np.asarray(pil.transform((w, h), Image.EXTENT, self.src_rect, Image.NEAREST))

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        x0, y0, x1, y1 = self.src_rect
        h, w = self.output_size
        coords = coords.astype(np.float32).copy()
        coords[:, 0] = (coords[:, 0] - x0) / (x1 - x0) * w
        coords[:, 1] = (coords[:, 1] - y0) / (y1 - y0) * h
        return coords

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        boxes = boxes.astype(np.float32).copy()
        pts = self.apply_coords(boxes.reshape(-1, 2).copy())
        return pts.reshape(-1, 4)


class BlendTransform(Transform):
    """out = src_weight * src_image + dst_weight * img (reference
    BlendTransform — the base of the color augmentations). Geometry is
    untouched."""

    def __init__(self, src_image, src_weight: float, dst_weight: float):
        self.src_image = src_image
        self.src_weight = src_weight
        self.dst_weight = dst_weight

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        out = self.src_weight * np.asarray(self.src_image, np.float32) + self.dst_weight * img.astype(np.float32)
        return np.clip(out, 0, 255).astype(img.dtype)

    def apply_segmentation(self, seg):
        return seg  # photometric only

    def apply_box(self, boxes):
        return boxes

    def apply_coords(self, coords):
        return coords


class RandomBrightness(Augmentation):
    """w ~ U[intensity_min, intensity_max]; out = w * img (reference
    augmentation_impl.py RandomBrightness)."""

    def __init__(self, intensity_min: float, intensity_max: float):
        self.lo, self.hi = intensity_min, intensity_max

    def get_transform(self, img, rng) -> Transform:
        w = rng.uniform(self.lo, self.hi)
        return BlendTransform(0.0, src_weight=1 - w, dst_weight=w)


class RandomContrast(Augmentation):
    def __init__(self, intensity_min: float, intensity_max: float):
        self.lo, self.hi = intensity_min, intensity_max

    def get_transform(self, img, rng) -> Transform:
        w = rng.uniform(self.lo, self.hi)
        return BlendTransform(img.mean(), src_weight=1 - w, dst_weight=w)


class RandomSaturation(Augmentation):
    def __init__(self, intensity_min: float, intensity_max: float):
        self.lo, self.hi = intensity_min, intensity_max

    def get_transform(self, img, rng) -> Transform:
        assert img.shape[-1] == 3, "RandomSaturation expects RGB"
        w = rng.uniform(self.lo, self.hi)
        grayscale = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
        return BlendTransform(grayscale[:, :, None], src_weight=1 - w, dst_weight=w)


class RandomLighting(Augmentation):
    """AlexNet-style PCA lighting jitter (reference RandomLighting)."""

    _EIGEN_VECS = np.array(
        [[-0.5675, 0.7192, 0.4009], [-0.5808, -0.0045, -0.8140], [-0.5836, -0.6948, 0.4203]],
        np.float32,
    )
    _EIGEN_VALS = np.array([0.2175, 0.0188, 0.0045], np.float32)

    def __init__(self, scale: float):
        self.scale = scale

    def get_transform(self, img, rng) -> Transform:
        assert img.shape[-1] == 3, "RandomLighting expects RGB"
        weights = rng.normal(scale=self.scale, size=3).astype(np.float32)
        shift = self._EIGEN_VECS @ (weights * self._EIGEN_VALS)
        return BlendTransform(shift[None, None, :] * 255.0, src_weight=1.0, dst_weight=1.0)


class RandomRotation(Augmentation):
    """Sample an angle (choice or range) (reference RandomRotation)."""

    def __init__(self, angle, expand: bool = True, sample_style: str = "range"):
        self.angle = angle if isinstance(angle, (list, tuple)) else (angle, angle)
        self.expand = expand
        self.sample_style = sample_style

    def get_transform(self, img, rng) -> Transform:
        if self.sample_style == "range":
            a = rng.uniform(min(self.angle), max(self.angle))
        else:
            a = self.angle[rng.randint(len(self.angle))]
        if abs(a) < 1e-6:
            return NoOpTransform()
        h, w = img.shape[:2]
        return RotationTransform(h, w, a, expand=self.expand)


# ---------------- keypoint transforms ----------------
def create_keypoint_hflip_indices(meta) -> np.ndarray:
    """(reference detection_utils.py:506-528) keypoint_names +
    keypoint_flip_map metadata -> per-keypoint horizontally-flipped index."""
    names = list(meta.get("keypoint_names") or ())
    flip_map = dict(meta.get("keypoint_flip_map") or ())
    flip_map.update({v: k for k, v in flip_map.items()})
    flipped = [flip_map.get(n, n) for n in names]
    return np.asarray([names.index(n) for n in flipped], np.int32)


def transform_keypoint_annotations(
    keypoints: np.ndarray, tfms, image_hw, hflip_indices: Optional[np.ndarray] = None
) -> np.ndarray:
    """(K, 3) (x, y, vis) keypoints through a TransformList (reference
    detection_utils.py:336-375): apply_coords on xy; out-of-boundary points
    become unlabeled (vis 0, xy zeroed per COCO convention); an odd number of
    HFlipTransforms swaps left/right keypoints via `hflip_indices`."""
    kp = np.asarray(keypoints, np.float64).reshape(-1, 3).copy()
    xy = tfms.apply_coords(kp[:, :2].astype(np.float32)).astype(np.float64)
    h, w = image_hw
    inside = (xy[:, 0] >= 0) & (xy[:, 1] >= 0) & (xy[:, 0] <= w) & (xy[:, 1] <= h)
    kp[:, :2] = xy
    kp[~inside, 2] = 0
    do_hflip = (
        sum(isinstance(t, HFlipTransform) for t in getattr(tfms, "transforms", [tfms])) % 2 == 1
    )
    if do_hflip:
        assert hflip_indices is not None, "hflip on keypoints needs keypoint_flip_map metadata"
        kp = kp[np.asarray(hflip_indices, np.int32)]
    kp[kp[:, 2] == 0] = 0  # COCO: unlabeled -> x = y = 0
    return kp.astype(np.float32)

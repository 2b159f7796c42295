"""COCO open-vocabulary (zero-shot) category splits.

Mirror of the reference data constants
(detectron2/data/datasets/coco_zeroshot_categories.py): 65 OVD categories =
48 base ("seen", used for training) + 17 novel ("unseen", test-only), the
standard split from Bansal et al. / OVR-CNN used by RegionCLIP's COCO-OVD
benchmark (docs/MODEL_ZOO.md novel AP50). Names are in `load_coco_json`
contiguous order. Pure data — the split is a published benchmark constant.
"""

# 17 novel/unseen class names (contiguous order)
COCO_UNSEEN_CLS = [
    "airplane", "bus", "cat", "dog", "cow", "elephant", "umbrella",
    "tie", "snowboard", "skateboard", "cup", "knife", "cake", "couch",
    "keyboard", "sink", "scissors",
]

# 48 base/seen class names (contiguous order)
COCO_SEEN_CLS = [
    "person", "bicycle", "car", "motorcycle", "train", "truck",
    "boat", "bench", "bird", "horse", "sheep", "bear", "zebra", "giraffe",
    "backpack", "handbag", "suitcase", "frisbee", "skis", "kite", "surfboard",
    "bottle", "fork", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "pizza", "donut", "chair", "bed", "toilet", "tv",
    "laptop", "mouse", "remote", "microwave", "oven", "toaster",
    "refrigerator", "book", "clock", "vase", "toothbrush",
]

# all 65 OVD class names (contiguous order)
COCO_OVD_ALL_CLS = [
    "person", "bicycle", "car", "motorcycle", "airplane",
    "bus", "train", "truck", "boat", "bench", "bird", "cat", "dog", "horse",
    "sheep", "cow", "elephant", "bear", "zebra", "giraffe", "backpack",
    "umbrella", "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "kite", "skateboard", "surfboard", "bottle", "cup", "fork", "knife",
    "spoon", "bowl", "banana", "apple", "sandwich", "orange", "broccoli",
    "carrot", "pizza", "donut", "cake", "chair", "couch", "bed", "toilet",
    "tv", "laptop", "mouse", "remote", "keyboard", "microwave", "oven",
    "toaster", "sink", "refrigerator", "book", "clock", "vase", "scissors",
    "toothbrush",
]

assert len(COCO_UNSEEN_CLS) == 17 and len(COCO_SEEN_CLS) == 48
assert len(COCO_OVD_ALL_CLS) == 65
assert set(COCO_OVD_ALL_CLS) == set(COCO_SEEN_CLS) | set(COCO_UNSEEN_CLS)

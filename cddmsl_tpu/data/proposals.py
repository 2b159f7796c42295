"""Precomputed-proposal loading (reference detectron2/data/build.py
load_proposals_into_dataset + detection_utils.py transform_proposals):
attach per-image proposal boxes + objectness logits from a proposal file
to the dataset dicts; the mapper transforms them with the image and keeps
the top-k by objectness.

File formats: .npz / .npy(pickled dict) / .pkl with keys
  ids                 list of image ids (str or int)
  boxes               list of (N_i, 4) float XYXY arrays
  objectness_logits   list of (N_i,) float arrays
(the reference's pickle schema, minus torch)."""

import pickle
from typing import Dict, List

import numpy as np


def load_proposal_file(path: str) -> Dict[str, object]:
    if path.endswith(".npz"):
        f = np.load(path, allow_pickle=True)
        return {"ids": list(f["ids"]), "boxes": list(f["boxes"]),
                "objectness_logits": list(f["objectness_logits"])}
    with open(path, "rb") as fh:
        data = pickle.load(fh)
    # d2 historical key rename (build.py:79-83)
    if "scores" in data and "objectness_logits" not in data:
        data["objectness_logits"] = data.pop("scores")
    return data


def load_proposals_into_dataset(dicts: List[dict], proposal_file: str) -> List[dict]:
    """Returns NEW dicts with 'proposal_boxes' / 'proposal_objectness_logits'
    attached by image id (reference build.py load_proposals_into_dataset)."""
    data = load_proposal_file(proposal_file)
    by_id = {str(i): k for k, i in enumerate(data["ids"])}
    out = []
    for d in dicts:
        d = dict(d)
        key = str(d.get("image_id"))
        if key in by_id:
            k = by_id[key]
            d["proposal_boxes"] = np.asarray(data["boxes"][k], np.float32).reshape(-1, 4)
            d["proposal_objectness_logits"] = np.asarray(
                data["objectness_logits"][k], np.float32
            ).reshape(-1)
        out.append(d)
    return out


def transform_proposals(dataset_dict: dict, image_hw, tfms, topk: int) -> dict:
    """Mapper-side: geometric transforms + clip + topk by objectness
    (reference detection_utils.py transform_proposals). Returns {} when the
    dict carries no proposals."""
    if "proposal_boxes" not in dataset_dict:
        return {}
    boxes = tfms.apply_box(np.asarray(dataset_dict["proposal_boxes"], np.float32))
    h, w = image_hw
    boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
    boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
    logits = np.asarray(dataset_dict["proposal_objectness_logits"], np.float32)
    keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    boxes, logits = boxes[keep], logits[keep]
    order = np.argsort(-logits)[:topk]
    return {"proposal_boxes": boxes[order], "proposal_objectness": logits[order]}

"""Builtin dataset registrations.

Mirrors the reference registrations (detectron2/data/datasets/builtin.py):
  * DG-paired VOC:    voc_{clipart,watercolor,comic}_{2007,2012}_{train,trainval}
    (builtin.py:322-341) — VOC images paired with dt_* translated twins
  * artistic tests:   Clipart1k_{test,train}, Watercolor_test, Comic_test,
    dt_Clipart_test… (builtin.py:361-409)
  * cityscapes DG:    cityscapes_DG_{train,val} + foggy/bdd val sets
    (builtin.py:228-304, 410-413)
  * plain VOC:        voc_{2007,2012}_{train,val,trainval,test}

Dataset root: $DETECTRON2_DATASETS (default "./datasets"). Registration is
lazy — loaders only touch disk when a dataset is actually requested.
"""

import os

from .cityscapes import CITYSCAPES_THING_CLASSES, register_cityscapes, register_cityscapes_DG
from .coco import register_coco_instances
from .voc import ARTISTIC_6_CLASSES, CLASS_NAMES, register_pascal_DG, register_pascal_voc

_REGISTERED = False


def register_all(root: str = None) -> None:
    global _REGISTERED
    if _REGISTERED:
        return
    _REGISTERED = True
    root = root or os.environ.get("DETECTRON2_DATASETS", "datasets")

    # ---- plain VOC (builtin.py register_all_pascal_voc) ----
    for year in (2007, 2012):
        for split in ("train", "val", "trainval", "test"):
            if year == 2012 and split == "test":
                continue
            register_pascal_voc(
                f"voc_{year}_{split}", os.path.join(root, f"VOC{year}"), split, year
            )

    # ---- DG-paired VOC (builtin.py:322-341) ----
    for domain, dt_dir in (
        ("clipart", "dt_clipart"),
        ("watercolor", "dt_watercolor"),
        ("comic", "dt_comic"),
    ):
        for year in (2007, 2012):
            for split in ("train", "trainval"):
                register_pascal_DG(
                    f"voc_{domain}_{year}_{split}",
                    os.path.join(root, f"VOC{year}"),
                    split,
                    year,
                    dt_dir,
                )

    # ---- artistic target domains (builtin.py:361-409) ----
    register_pascal_voc("Clipart1k_train", os.path.join(root, "clipart"), "train", 2007)
    register_pascal_voc("Clipart1k_test", os.path.join(root, "clipart"), "test", 2007)
    register_pascal_voc(
        "Watercolor_train", os.path.join(root, "watercolor"), "train", 2007, ARTISTIC_6_CLASSES
    )
    register_pascal_voc(
        "Watercolor_test", os.path.join(root, "watercolor"), "test", 2007, ARTISTIC_6_CLASSES
    )
    register_pascal_voc(
        "Comic_train", os.path.join(root, "comic"), "train", 2007, ARTISTIC_6_CLASSES
    )
    register_pascal_voc(
        "Comic_test", os.path.join(root, "comic"), "test", 2007, ARTISTIC_6_CLASSES
    )
    register_pascal_voc("dt_Clipart_test", os.path.join(root, "dt_clipart", "VOC2007"), "test", 2007)

    # ---- cityscapes + adverse weather (builtin.py:228-304) ----
    city = os.path.join(root, "cityscapes")
    for split in ("train", "val"):
        img_dir = os.path.join(city, "leftImg8bit", split)
        gt_dir = os.path.join(city, "gtFine", split)
        foggy_dir = os.path.join(city, "leftImg8bit_foggy", split)
        register_cityscapes(f"cityscapes_{split}", img_dir, gt_dir)
        register_cityscapes_DG(f"cityscapes_DG_{split}", img_dir, gt_dir, foggy_dir)
        register_cityscapes(
            f"cityscapes_foggy_{split}",
            foggy_dir if os.path.isdir(foggy_dir) else img_dir,
            gt_dir,
        )

    # ---- BDD100k val via COCO json (builtin.py:410-413) ----
    register_coco_instances(
        "bdd_100k_val",
        os.path.join(root, "bdd100k", "labels", "bdd100k_labels_images_det_coco_val.json"),
        os.path.join(root, "bdd100k", "images", "100k", "val"),
    )

    # ---- COCO (RegionCLIP pretraining / zero-shot benchmarks) ----
    for split in ("train", "val"):
        register_coco_instances(
            f"coco_2017_{split}",
            os.path.join(root, "coco", "annotations", f"instances_{split}2017.json"),
            os.path.join(root, "coco", f"{split}2017"),
        )

    # ---- COCO open-vocabulary splits (reference builtin.py:50-56
    # _PREDEFINED_SPLITS_COCO["coco_ovd"]): 48-base ("b") / 17-novel ("t")
    # / 65-all annotation subsets for the RegionCLIP OVD benchmark; the
    # 65-class evaluator reports AP50_split_{target,base,all}
    # (evaluation/coco_eval.py) ----
    for ovd_split, img_split in (
        ("ovd_all_train", "train"), ("ovd_b_train", "train"), ("ovd_t_train", "train"),
        ("ovd_all_test", "val"), ("ovd_b_test", "val"), ("ovd_t_test", "val"),
    ):
        register_coco_instances(
            f"coco_2017_{ovd_split}",
            os.path.join(
                root, "coco", "annotations",
                f"ovd_ins_{img_split}2017_{ovd_split.split('_')[1]}.json",
            ),
            os.path.join(root, "coco", f"{img_split}2017"),
        )

    # ---- COCO panoptic (reference builtin.py register_all_coco panoptic
    # rows; evaluator_type coco_panoptic_seg -> PQ/SQ/RQ) ----
    from .coco_panoptic import register_coco_panoptic

    for split in ("train", "val"):
        register_coco_panoptic(
            f"coco_2017_{split}_panoptic",
            os.path.join(root, "coco", "annotations", f"panoptic_{split}2017.json"),
            os.path.join(root, "coco", f"{split}2017"),
            os.path.join(root, "coco", f"panoptic_{split}2017"),
        )

    # ---- LVIS v1 + v0.5 (reference builtin.py register_all_lvis) ----
    from .lvis import register_lvis_instances

    for version in ("v1", "v0.5"):
        for split in ("train", "val"):
            register_lvis_instances(
                f"lvis_{version}_{split}",
                os.path.join(root, "lvis", f"lvis_{version}_{split}.json"),
                os.path.join(root, "coco"),  # LVIS images live in the COCO dirs
            )

    # ---- reference-named cityscapes instance-seg aliases (builtin.py
    # register_all_cityscapes: cityscapes_fine_instance_seg_{train,val}) ----
    for split in ("train", "val"):
        register_cityscapes(
            f"cityscapes_fine_instance_seg_{split}",
            os.path.join(city, "leftImg8bit", split),
            os.path.join(city, "gtFine", split),
        )

    # ---- cityscapes panoptic (reference cityscapes_panoptic.py:127-188) ----
    from .cityscapes_panoptic import register_all_cityscapes_panoptic

    register_all_cityscapes_panoptic(root)

    # ---- cityscapes semantic (reference builtin.py register_all_cityscapes
    # sem_seg rows: cityscapes_fine_sem_seg_{train,val}) ----
    from .cityscapes import register_cityscapes_semantic

    for split in ("train", "val"):
        register_cityscapes_semantic(
            f"cityscapes_fine_sem_seg_{split}",
            os.path.join(city, "leftImg8bit", split),
            os.path.join(city, "gtFine", split),
        )

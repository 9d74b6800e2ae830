"""COCO-format dataset (json annotations → roidb).

Counterpart of the reference's ``lib/datasets/coco.py`` (which wraps the
vendored pycocotools). Training needs only boxes/classes, parsed here from
the COCO json directly (no pycocotools dependency, crowd boxes excluded
like ``cfg.TRAIN.USE_ALL_GT=False`` would). COCO-protocol *evaluation*
(mask RLE, 101-point AP) requires the upstream ``pycocotools`` package; when
absent, :func:`evaluate` falls back to the VOC-style per-class AP over the
in-memory ground truth.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np


class COCODetection:
    """Minimal COCO-format reader exposing the same surface the loaders and
    eval driver need (``image_index``, ``classes``, ``gt_roidb``)."""

    def __init__(self, name: str, image_dir: str, annotation_file: str):
        self.name = name
        self.image_dir = image_dir
        with open(annotation_file) as f:
            data = json.load(f)
        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.classes = ("__background__",) + tuple(c["name"] for c in cats)
        self.num_classes = len(self.classes)
        self._cat_to_ind = {c["id"]: i + 1 for i, c in enumerate(cats)}
        self._images = {im["id"]: im for im in data["images"]}
        self._anns: Dict[int, List[dict]] = {}
        for ann in data["annotations"]:
            if ann.get("iscrowd", 0):
                continue
            self._anns.setdefault(ann["image_id"], []).append(ann)
        self.image_ids = sorted(self._images)
        self.image_index = [os.path.splitext(
            self._images[i]["file_name"])[0] for i in self.image_ids]
        self.image_ext = ".jpg"

    def image_path(self, index_or_id) -> str:
        if isinstance(index_or_id, int):
            return os.path.join(self.image_dir,
                                self._images[index_or_id]["file_name"])
        for iid in self.image_ids:
            if os.path.splitext(self._images[iid]["file_name"])[0] \
                    == index_or_id:
                return os.path.join(self.image_dir,
                                    self._images[iid]["file_name"])
        raise KeyError(index_or_id)

    def gt_roidb(self) -> List[dict]:
        roidb = []
        for iid in self.image_ids:
            im = self._images[iid]
            anns = self._anns.get(iid, [])
            boxes = np.zeros((len(anns), 4), np.float32)
            classes = np.zeros((len(anns),), np.int32)
            for k, ann in enumerate(anns):
                x, y, w, h = ann["bbox"]
                # xywh → 0-based inclusive xyxy, clipped (reference
                # coco.py's _load_coco_annotation box sanitization)
                boxes[k] = [max(0, x), max(0, y),
                            min(im["width"] - 1, x + max(0, w - 1)),
                            min(im["height"] - 1, y + max(0, h - 1))]
                classes[k] = self._cat_to_ind[ann["category_id"]]
            keep = (boxes[:, 2] >= boxes[:, 0]) & (boxes[:, 3] >= boxes[:, 1])
            roidb.append({
                "boxes": boxes[keep], "gt_classes": classes[keep],
                "gt_ishard": np.zeros(int(keep.sum()), np.int32),
                "flipped": False,
                "width": im["width"], "height": im["height"],
                "image": os.path.join(self.image_dir, im["file_name"]),
                "img_id": os.path.splitext(im["file_name"])[0],
            })
        return roidb

"""LVIS v0.5 annotation loading — self-contained JSON parsing (no lvis-api).

Parity: /root/reference/mmdet/datasets/lvis.py and the vendored
lvis-api/lvis/lvis.py index. Conventions preserved:
- contiguous 1-based labels by ascending category id (lvis.py:14-26 —
  identity for LVIS v0.5 whose ids are already 1..1230);
- bbox xywh -> xyxy with the -1 convention: [x, y, x+w-1, y+h-1]
  (lvis.py:83);
- annotations with area <= 0 or w/h < 1 dropped (lvis.py:81-82);
- training images without annotations or min(w,h) < 32 filtered
  (lvis.py:47-56);
- the `filename` is the tail of file_name split on '_' (lvis.py:31 — LVIS
  file_names look like COCO_val2014_00000xxxx.jpg).

Also exposes the per-image `neg_category_ids` / `not_exhaustive_category_ids`
needed by the federated evaluator.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import numpy as np


class LvisDataset:
    def __init__(
        self,
        ann_file: str,
        img_prefix: str = "",
        test_mode: bool = False,
        min_size: int = 32,
    ):
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        with open(ann_file) as f:
            data = json.load(f)

        self.categories = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_ids = [c["id"] for c in self.categories]
        self.cat2label = {cid: i + 1 for i, cid in enumerate(self.cat_ids)}
        self.label2cat = {v: k for k, v in self.cat2label.items()}
        self.class_names = tuple(c["name"] for c in self.categories)

        self.img_infos: List[Dict[str, Any]] = []
        anns_by_img: Dict[int, List[dict]] = {}
        for ann in data["annotations"]:
            anns_by_img.setdefault(ann["image_id"], []).append(ann)
        self._anns_by_img = anns_by_img

        for info in data["images"]:
            info = dict(info)
            info["filename"] = info["file_name"].split("_")[-1]
            self.img_infos.append(info)
        self.img_ids = [i["id"] for i in self.img_infos]

        if not test_mode:
            keep = []
            for i, info in enumerate(self.img_infos):
                if info["id"] not in anns_by_img:
                    continue
                if min(info["width"], info["height"]) >= min_size:
                    keep.append(i)
            self.img_infos = [self.img_infos[i] for i in keep]
            self.img_ids = [i["id"] for i in self.img_infos]

    def __len__(self) -> int:
        return len(self.img_infos)

    def get_ann_info(self, idx: int) -> Dict[str, Any]:
        info = self.img_infos[idx]
        anns = self._anns_by_img.get(info["id"], [])
        gt_bboxes, gt_labels, gt_ignore, gt_masks = [], [], [], []
        for ann in anns:
            if ann.get("ignore", False):
                continue
            x1, y1, w, h = ann["bbox"]
            if ann.get("area", w * h) <= 0 or w < 1 or h < 1:
                continue
            bbox = [x1, y1, x1 + w - 1, y1 + h - 1]
            if ann.get("iscrowd", 0):
                gt_ignore.append(bbox)
            else:
                gt_bboxes.append(bbox)
                gt_labels.append(self.cat2label[ann["category_id"]])
                gt_masks.append(ann.get("segmentation"))
        return dict(
            bboxes=np.asarray(gt_bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(gt_labels, np.int32),
            bboxes_ignore=np.asarray(gt_ignore, np.float32).reshape(-1, 4),
            masks=gt_masks,
        )

    def instance_counts(self) -> np.ndarray:
        """(num_classes+1,) per-label instance counts from category metadata
        (lvis_analyse.py:23-25 source for the GS partition)."""
        counts = np.zeros(len(self.cat_ids) + 1, np.int64)
        for i, c in enumerate(self.categories):
            counts[i + 1] = c.get("instance_count", 0)
        return counts

    def federated_fields(self, idx: int):
        info = self.img_infos[idx]
        return (
            info.get("neg_category_ids", []),
            info.get("not_exhaustive_category_ids", []),
        )

    def image_path(self, idx: int) -> str:
        """Prefer the stripped COCO filename (reference layout: val2017/
        000000xxx.jpg, lvis.py:31); fall back to the raw file_name."""
        import os

        info = self.img_infos[idx]
        p = os.path.join(self.img_prefix, info["filename"])
        if os.path.exists(p):
            return p
        return os.path.join(self.img_prefix, info["file_name"])

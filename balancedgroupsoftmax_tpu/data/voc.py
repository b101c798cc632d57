"""Pascal VOC XML dataset reader.

Parity: /root/reference/mmdet/datasets/voc.py + xml_style.py — image list
from ImageSets/Main, per-image XML annotations (bndbox is 1-based: the
reference subtracts 1 from x1/y1; `difficult` objects go to ignore).
Yields the same dict interface as LvisDataset so the train/test pipelines
work unchanged; evaluation uses eval/mean_ap.py (VOC-style mAP).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List

import numpy as np

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


class VOCDataset:
    def __init__(
        self,
        root: str,  # VOCdevkit/VOC2007-style root
        split: str = "trainval",
        classes=VOC_CLASSES,
        min_size: int = 32,
        test_mode: bool = False,
    ):
        self.root = root
        self.classes = tuple(classes)
        self.cat2label = {name: i + 1 for i, name in enumerate(self.classes)}
        self.cat_ids = list(range(1, len(self.classes) + 1))

        split_file = os.path.join(root, "ImageSets", "Main", f"{split}.txt")
        with open(split_file) as f:
            ids = [line.strip() for line in f if line.strip()]

        self.img_infos: List[Dict] = []
        for img_id in ids:
            xml_path = os.path.join(root, "Annotations", f"{img_id}.xml")
            tree = ET.parse(xml_path)
            size = tree.find("size")
            w = int(size.find("width").text)
            h = int(size.find("height").text)
            if not test_mode and min(w, h) < min_size:
                continue
            self.img_infos.append(
                dict(
                    id=img_id,
                    filename=os.path.join("JPEGImages", f"{img_id}.jpg"),
                    width=w,
                    height=h,
                    xml=xml_path,
                )
            )

    def __len__(self):
        return len(self.img_infos)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.root, self.img_infos[idx]["filename"])

    def get_ann_info(self, idx: int) -> Dict:
        return self._parse_xml(self.img_infos[idx]["xml"])

    def _parse_xml(self, xml_path: str) -> Dict:
        tree = ET.parse(xml_path)
        bboxes, labels, ignore = [], [], []
        for obj in tree.findall("object"):
            name = obj.find("name").text
            if name not in self.cat2label:
                continue
            difficult = int(obj.find("difficult").text or 0)
            bb = obj.find("bndbox")
            # VOC coords are 1-based (xml_style.py subtracts 1)
            box = [
                float(bb.find("xmin").text) - 1,
                float(bb.find("ymin").text) - 1,
                float(bb.find("xmax").text) - 1,
                float(bb.find("ymax").text) - 1,
            ]
            if difficult:
                ignore.append(box)
            else:
                bboxes.append(box)
                labels.append(self.cat2label[name])
        return dict(
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int32),
            bboxes_ignore=np.asarray(ignore, np.float32).reshape(-1, 4),
            masks=[None] * len(labels),
        )


class WIDERFaceDataset(VOCDataset):
    """WIDER Face in PASCAL-VOC XML layout.

    Parity: /root/reference/mmdet/datasets/wider_face.py — the annotation
    file is a plain list of image ids (one per line, no ImageSets/ tree);
    each XML carries a `folder` element naming the event subdirectory the
    .jpg lives under; single class 'face'. Box parsing (1-based coords,
    `difficult` -> ignore) is inherited from the VOC reader.
    """

    def __init__(
        self,
        root: str,  # prefix holding Annotations/ and the event folders
        ann_file: str,  # text file of image ids
        min_size: int = 0,
        test_mode: bool = False,
    ):
        self.root = root
        self.classes = ("face",)
        self.cat2label = {"face": 1}
        self.cat_ids = [1]

        with open(ann_file) as f:
            ids = [line.strip() for line in f if line.strip()]

        self.img_infos = []
        for img_id in ids:
            xml_path = os.path.join(root, "Annotations", f"{img_id}.xml")
            tree = ET.parse(xml_path)
            size = tree.find("size")
            w = int(size.find("width").text)
            h = int(size.find("height").text)
            if not test_mode and min_size and min(w, h) < min_size:
                continue
            folder = tree.find("folder").text
            self.img_infos.append(
                dict(
                    id=img_id,
                    filename=os.path.join(folder, f"{img_id}.jpg"),
                    width=w,
                    height=h,
                    xml=xml_path,
                )
            )

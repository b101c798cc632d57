"""Cityscapes detection annotations (COCO-schema JSON).

Parity: /root/reference/mmdet/datasets/cityscapes.py — upstream it is a
CocoDataset subclass that only pins the 8 Cityscapes instance classes;
the annotation files come pre-converted to COCO schema (the standard
cityscapes-to-coco conversion), so loading is the shared COCO-schema
reader. Two behavioral differences from LVIS handled here:

- file names are nested relative paths like
  ``frankfurt/frankfurt_000000_000294_leftImg8bit.png`` — they must NOT
  be split on '_' the way LVIS COCO_val2014_*.jpg names are
  (datasets/lvis.py:31 is LVIS-specific);
- the class list is validated against the canonical 8 names so a wrong
  annotation file fails loudly instead of silently training with shifted
  labels.
"""

from __future__ import annotations

from .lvis import LvisDataset


class CityscapesDataset(LvisDataset):
    CLASSES = (
        "person",
        "rider",
        "car",
        "truck",
        "bus",
        "train",
        "motorcycle",
        "bicycle",
    )

    def __init__(self, ann_file: str, img_prefix: str = "",
                 test_mode: bool = False, min_size: int = 32):
        super().__init__(ann_file, img_prefix, test_mode, min_size)
        # keep the full (possibly nested) relative path
        for info in self.img_infos:
            info["filename"] = info["file_name"]
        if self.class_names != self.CLASSES:
            raise ValueError(
                "annotation categories do not match the Cityscapes classes: "
                f"got {self.class_names}"
            )

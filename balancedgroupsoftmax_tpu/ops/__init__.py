from .boxes import (
    bbox2delta,
    delta2bbox,
    bbox_overlaps,
    bbox_flip,
    bbox_mapping,
    bbox_mapping_back,
    bbox_area,
)

__all__ = [
    "bbox2delta",
    "delta2bbox",
    "bbox_overlaps",
    "bbox_flip",
    "bbox_mapping",
    "bbox_mapping_back",
    "bbox_area",
]

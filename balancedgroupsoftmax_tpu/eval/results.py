"""Detection output -> LVIS result records / JSON.

Parity: /root/reference/mmdet/core/evaluation/lvis_utils.py —
`det2json` (:108-120 via results2json :176-201) and the xyxy->xywh
conversion with the +1 convention (:98-105). Labels are 0-based foreground
indices; category_id = dataset.cat_ids[label].
"""

from __future__ import annotations

import json
from typing import Dict, List, Sequence

import numpy as np


def xyxy2xywh(b: np.ndarray) -> List[float]:
    return [float(b[0]), float(b[1]), float(b[2] - b[0] + 1), float(b[3] - b[1] + 1)]


def detections_to_records(
    image_id: int,
    boxes: np.ndarray,  # (M, 4) xyxy at original image scale
    scores: np.ndarray,  # (M,)
    labels: np.ndarray,  # (M,) int 0-based fg label
    valid: np.ndarray,  # (M,) bool
    cat_ids: Sequence[int],  # label index -> category id
) -> List[dict]:
    out = []
    for i in range(len(boxes)):
        if not valid[i]:
            continue
        out.append(
            dict(
                image_id=int(image_id),
                bbox=xyxy2xywh(boxes[i]),
                score=float(scores[i]),
                category_id=int(cat_ids[int(labels[i])]),
            )
        )
    return out


def write_results_json(records: List[dict], path: str) -> None:
    with open(path, "w") as f:
        json.dump(records, f)

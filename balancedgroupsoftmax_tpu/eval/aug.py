"""Test-time augmentation merging (multi-scale / flip testing).

Parity: /root/reference/mmdet/core/post_processing/merge_augs.py —
`merge_aug_proposals` (:8-45: map back, concat, NMS, top-k),
`merge_aug_bboxes` (:46-80: map back, average boxes and scores),
`merge_aug_masks` (:81-98: average mask probs; flipped masks un-flipped),
driven by the MultiScaleFlipAug pipeline (datasets/pipelines/test_aug.py).

Functions take fixed-capacity arrays with validity masks, jit-friendly.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_mapping_back
from ..ops.nms import nms


def merge_aug_proposals(
    aug_boxes: Sequence[jnp.ndarray],  # per aug (P, 4) in that aug's frame
    aug_scores: Sequence[jnp.ndarray],  # per aug (P,)
    aug_valid: Sequence[jnp.ndarray],  # per aug (P,) bool
    img_shapes: Sequence[Tuple[int, int]],  # per aug network-scale shape
    scale_factors: Sequence[float],
    flips: Sequence[bool],
    nms_thr: float = 0.7,
    max_num: int = 2000,
):
    """Map proposals to the original frame, concat, re-NMS, keep top max_num."""
    boxes, scores, valid = [], [], []
    for b, s, v, shape, sf, fl in zip(
        aug_boxes, aug_scores, aug_valid, img_shapes, scale_factors, flips
    ):
        boxes.append(bbox_mapping_back(b, shape, sf, fl))
        scores.append(s)
        valid.append(v)
    return nms(
        jnp.concatenate(boxes),
        jnp.concatenate(scores),
        jnp.concatenate(valid),
        nms_thr,
        max_num,
    )


def merge_aug_bboxes(
    aug_boxes: Sequence[jnp.ndarray],  # per aug (N, 4) decoded, aug frame
    aug_scores: Sequence[jnp.ndarray],  # per aug (N, C)
    img_shapes: Sequence[Tuple[int, int]],
    scale_factors: Sequence[float],
    flips: Sequence[bool],
):
    """Average mapped-back boxes and scores across augs (merge_augs.py:46-80).

    Requires each aug to score the SAME proposal set (the reference runs the
    rcnn head per aug on shared merged proposals mapped into each frame).
    """
    mapped = [
        bbox_mapping_back(b, shape, sf, fl)
        for b, shape, sf, fl in zip(aug_boxes, img_shapes, scale_factors, flips)
    ]
    boxes = sum(mapped) / len(mapped)
    scores = sum(aug_scores) / len(aug_scores)
    return boxes, scores


def merge_aug_masks(
    aug_masks: Sequence[np.ndarray],  # per aug (N, M, M) sigmoid probs
    flips: Sequence[bool],
) -> np.ndarray:
    """Average mask probabilities, un-flipping horizontal flips."""
    fixed = [
        m[..., ::-1] if fl else m for m, fl in zip(aug_masks, flips)
    ]
    return sum(np.asarray(f, np.float64) for f in fixed) / len(fixed)


def flip_image_content(images_np: np.ndarray, shapes_np: np.ndarray) -> np.ndarray:
    """Flip each image's CONTENT region, not the padded canvas.

    The reference applies RandomFlip BEFORE Pad
    (datasets/pipelines/transforms.py:171,223): content stays at the
    origin. Flipping the whole padded canvas would shift content right by
    the pad width (e.g. 277 px for a 1067-wide image in the 1344 bucket)
    while box clipping still assumes the origin."""
    out = np.array(images_np)
    for i in range(len(out)):
        w = int(round(float(shapes_np[i][1])))
        out[i, :, :w] = out[i, :, :w][:, ::-1]
    return out


def unflip_boxes(boxes: np.ndarray, new_w: float, sf: float) -> np.ndarray:
    """Map boxes from a content-flipped pass back to the original frame:
    bbox_flip at network scale (the -1 convention on the resized content
    width new_w), then rescale — bbox_mapping_back semantics
    (core/bbox/transforms.py:114-148)."""
    fb = boxes.copy()
    x1 = fb[..., 0].copy()
    fb[..., 0] = (new_w - 1.0) / sf - fb[..., 2]
    fb[..., 2] = (new_w - 1.0) / sf - x1
    return fb

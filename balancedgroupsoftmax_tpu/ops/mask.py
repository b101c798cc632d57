"""Mask targets and mask pasting for Mask R-CNN.

Parity: /root/reference/mmdet/core/mask/mask_target.py (crop the GT mask to
each positive proposal and resize to 28x28) and
mmdet/models/mask_heads/fcn_mask_head.py:125 `get_seg_masks` (paste the
predicted 28x28 sigmoid mask into the full image, threshold 0.5).

TPU redesign of the target path: instead of carrying full-resolution GT
bitmaps onto the device (dynamic image-sized masks), the input pipeline
rasterizes each GT mask into a fixed (CROP, CROP) crop normalized to its own
bbox. `mask_target_single` then bilinearly resamples that crop through the
roi->gtbox coordinate transform — all static shapes, one gather. This is
the standard TPU Mask R-CNN formulation; numerics match the reference's
cv2-resize crop to within resampling tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

GT_MASK_CROP = 112  # resolution of per-GT normalized mask crops


def rasterize_gt_masks(
    segmentations,  # list of COCO segmentation fields (or None)
    gt_boxes: np.ndarray,  # (N, 4) xyxy at ORIGINAL image scale
    img_h: int,
    img_w: int,
    capacity: int,
    crop: int = GT_MASK_CROP,
) -> np.ndarray:
    """Host-side: polygons/RLE -> (capacity, crop, crop) float32 bbox-normalized
    crops."""
    import cv2

    from ..utils.rle import segmentation_to_mask

    out = np.zeros((capacity, crop, crop), np.float32)
    for i, seg in enumerate(segmentations[:capacity]):
        if seg is None:
            continue
        m = segmentation_to_mask(seg, img_h, img_w)
        x1, y1, x2, y2 = gt_boxes[i]
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)) + 1, int(np.ceil(y2)) + 1
        patch = m[max(y1i, 0) : y2i, max(x1i, 0) : x2i]
        if patch.size == 0:
            continue
        out[i] = cv2.resize(
            patch.astype(np.float32), (crop, crop), interpolation=cv2.INTER_LINEAR
        )
    return out


def mask_target_single(
    rois: jnp.ndarray,  # (S, 4) sampled boxes (network scale)
    gt_boxes: jnp.ndarray,  # (G, 4) gt boxes (network scale)
    gt_inds: jnp.ndarray,  # (S,) 0-based index of assigned gt per roi
    gt_mask_crops: jnp.ndarray,  # (G, CROP, CROP) bbox-normalized masks
    pos_mask: jnp.ndarray,  # (S,) bool
    mask_size: int = 28,
) -> jnp.ndarray:
    """(S, mask_size, mask_size) binary float targets for positive rois."""
    crop = gt_mask_crops.shape[-1]
    g = jnp.clip(gt_inds, 0, gt_boxes.shape[0] - 1)
    gb = gt_boxes[g]  # (S, 4)
    crops = gt_mask_crops[g]  # (S, crop, crop)

    # roi sample points in gt-box-normalized crop coordinates
    gx1, gy1, gx2, gy2 = gb[:, 0], gb[:, 1], gb[:, 2], gb[:, 3]
    gw = jnp.maximum(gx2 - gx1 + 1.0, 1.0)
    gh = jnp.maximum(gy2 - gy1 + 1.0, 1.0)
    rx1, ry1, rx2, ry2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    rw = jnp.maximum(rx2 - rx1 + 1.0, 1.0)
    rh = jnp.maximum(ry2 - ry1 + 1.0, 1.0)

    # center of each output pixel in image coords, then -> crop coords
    u = (jnp.arange(mask_size, dtype=jnp.float32) + 0.5) / mask_size  # (M,)
    px = rx1[:, None] + u[None, :] * rw[:, None]  # (S, M)
    py = ry1[:, None] + u[None, :] * rh[:, None]
    cx = (px - gx1[:, None]) / gw[:, None] * crop - 0.5  # crop-pixel coords
    cy = (py - gy1[:, None]) / gh[:, None] * crop - 0.5

    def sample(cr, ys, xs):
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, crop - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, crop - 1)
        y1_ = jnp.clip(y0 + 1, 0, crop - 1)
        x1_ = jnp.clip(x0 + 1, 0, crop - 1)
        wy = jnp.clip(ys - y0, 0.0, 1.0)
        wx = jnp.clip(xs - x0, 0.0, 1.0)
        yy0 = y0[:, None]
        yy1 = y1_[:, None]
        xx0 = x0[None, :]
        xx1 = x1_[None, :]
        v00 = cr[yy0, xx0]
        v01 = cr[yy0, xx1]
        v10 = cr[yy1, xx0]
        v11 = cr[yy1, xx1]
        wyy = wy[:, None]
        wxx = wx[None, :]
        return (
            v00 * (1 - wyy) * (1 - wxx)
            + v01 * (1 - wyy) * wxx
            + v10 * wyy * (1 - wxx)
            + v11 * wyy * wxx
        )

    vals = jax.vmap(sample)(crops, cy, cx)  # (S, M, M)
    inside = (
        (cx[:, None, :] >= -1.0)
        & (cx[:, None, :] <= crop)
        & (cy[:, :, None] >= -1.0)
        & (cy[:, :, None] <= crop)
    )
    vals = jnp.where(inside, vals, 0.0)
    targets = (vals >= 0.5).astype(jnp.float32)
    return jnp.where(pos_mask[:, None, None], targets, 0.0)


def paste_mask(
    mask: np.ndarray,  # (M, M) sigmoid probabilities
    box: np.ndarray,  # (4,) xyxy at original image scale
    img_h: int,
    img_w: int,
    thr: float = 0.5,
) -> np.ndarray:
    """Host-side paste (fcn_mask_head.py:125-170 parity): resize the mask to
    the box extent (+1 convention, np.round like the reference) and
    threshold into a full-image uint8 mask."""
    import cv2

    x1 = max(int(np.round(box[0])), 0)
    y1 = max(int(np.round(box[1])), 0)
    w = max(int(np.round(box[2] - box[0] + 1)), 1)
    h = max(int(np.round(box[3] - box[1] + 1)), 1)
    w = min(w, img_w - x1)
    h = min(h, img_h - y1)
    out = np.zeros((img_h, img_w), np.uint8)
    if w <= 0 or h <= 0:
        return out
    resized = cv2.resize(mask.astype(np.float32), (w, h))
    out[y1 : y1 + h, x1 : x1 + w] = (resized > thr).astype(np.uint8)
    return out

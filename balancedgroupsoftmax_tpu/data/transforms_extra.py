"""Augmentation transforms beyond the core resize/flip/normalize pipeline.

Parity: /root/reference/mmdet/datasets/pipelines/transforms.py —
PhotoMetricDistortion (:approx 424-505, SSD-style color jitter), Expand
(:507-545, paste on a larger mean-filled canvas), MinIoURandomCrop
(:547-620, crop keeping boxes above a sampled IoU), RandomCrop (:332-367).
All operate host-side on uint8 RGB + xyxy boxes before the static-bucket
padding, like the reference's train pipeline ordering.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def photo_metric_distortion(
    img: np.ndarray,
    rng: np.random.RandomState,
    brightness_delta: int = 32,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: int = 18,
) -> np.ndarray:
    """SSD photometric distortion on uint8 RGB."""
    import cv2

    img = img.astype(np.float32)
    if rng.randint(2):
        img += rng.uniform(-brightness_delta, brightness_delta)
    contrast_first = rng.randint(2)
    if contrast_first and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
        np.float32
    )
    if rng.randint(2):
        hsv[..., 1] *= rng.uniform(*saturation_range)
    if rng.randint(2):
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)) % 180
    img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
        np.float32
    )
    if not contrast_first and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    return np.clip(img, 0, 255).astype(np.uint8)


def expand(
    img: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.RandomState,
    mean: Tuple[float, ...] = (123.675, 116.28, 103.53),
    ratio_range: Tuple[float, float] = (1.0, 4.0),
    prob: float = 0.5,
):
    """Paste the image at a random spot on a mean-filled larger canvas."""
    if rng.rand() > prob:
        return img, boxes
    h, w = img.shape[:2]
    ratio = rng.uniform(*ratio_range)
    eh, ew = int(h * ratio), int(w * ratio)
    canvas = np.empty((eh, ew, 3), img.dtype)
    canvas[...] = np.asarray(mean, img.dtype)
    top = rng.randint(0, eh - h + 1)
    left = rng.randint(0, ew - w + 1)
    canvas[top : top + h, left : left + w] = img
    boxes = boxes.copy()
    if len(boxes):
        boxes[:, [0, 2]] += left
        boxes[:, [1, 3]] += top
    return canvas, boxes


def min_iou_random_crop(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    rng: np.random.RandomState,
    min_ious: Tuple[float, ...] = (0.1, 0.3, 0.5, 0.7, 0.9),
    min_crop_size: float = 0.3,
    max_trials: int = 50,
):
    """Random crop keeping all remaining boxes above a sampled IoU with the
    crop; boxes whose centers fall outside are dropped."""
    from ..eval.mean_ap import _iou_xyxy

    h, w = img.shape[:2]
    while True:
        mode = rng.choice([1.0, *min_ious, 0.0])
        if mode == 1.0:
            return img, boxes, labels
        for _ in range(max_trials):
            cw = rng.uniform(min_crop_size * w, w)
            ch = rng.uniform(min_crop_size * h, h)
            if ch / cw < 0.5 or ch / cw > 2:
                continue
            left = rng.uniform(0, w - cw)
            top = rng.uniform(0, h - ch)
            patch = np.array([left, top, left + cw, top + ch])
            if len(boxes):
                ious = _iou_xyxy(boxes, patch[None])
                if ious.min() < mode:
                    continue
                ctr = (boxes[:, :2] + boxes[:, 2:]) / 2
                keep = (
                    (ctr[:, 0] > patch[0])
                    & (ctr[:, 1] > patch[1])
                    & (ctr[:, 0] < patch[2])
                    & (ctr[:, 1] < patch[3])
                )
                if not keep.any():
                    continue
                nb = boxes[keep].copy()
                nb[:, :2] = np.maximum(nb[:, :2], patch[:2]) - patch[:2]
                nb[:, 2:] = np.minimum(nb[:, 2:], patch[2:]) - patch[:2]
                nl = labels[keep]
            else:
                nb, nl = boxes, labels
            crop = img[int(top) : int(top + ch), int(left) : int(left + cw)]
            return crop, nb, nl


def random_crop(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray,
    rng: np.random.RandomState,
    crop_size: Tuple[int, int],
):
    """Fixed-size random crop (transforms.py RandomCrop): boxes clipped,
    degenerate ones dropped."""
    h, w = img.shape[:2]
    ch, cw = min(crop_size[0], h), min(crop_size[1], w)
    top = rng.randint(0, h - ch + 1)
    left = rng.randint(0, w - cw + 1)
    crop = img[top : top + ch, left : left + cw]
    if len(boxes):
        nb = boxes.copy()
        nb[:, [0, 2]] -= left
        nb[:, [1, 3]] -= top
        nb[:, [0, 2]] = nb[:, [0, 2]].clip(0, cw - 1)
        nb[:, [1, 3]] = nb[:, [1, 3]].clip(0, ch - 1)
        keep = (nb[:, 2] > nb[:, 0]) & (nb[:, 3] > nb[:, 1])
        return crop, nb[keep], labels[keep]
    return crop, boxes, labels


def albu_wrapper(transform, min_visible: float = 0.0):
    """Adapt an albumentations-style transform to this pipeline's
    ``(img, boxes, labels, rng) -> (img, boxes, labels)`` convention.

    Parity: /root/reference/mmdet/datasets/pipelines/transforms.py `Albu`
    (:approx 622-750) — the reference wraps the third-party albumentations
    library, converting boxes to/from its `pascal_voc` (xyxy) format and
    dropping boxes the transform removes. `transform` is anything callable
    as ``transform(image=..., bboxes=..., labels=...)`` returning a dict
    with the same keys (an ``albumentations.Compose(...,
    bbox_params=BboxParams('pascal_voc', label_fields=['labels']))``, or
    any user object with that interface — no hard dependency).
    """

    def apply(img, boxes, labels, rng=None):
        res = transform(
            image=img,
            bboxes=[tuple(map(float, b)) for b in boxes],
            labels=list(map(int, labels)),
        )
        nb = np.asarray(res["bboxes"], np.float32).reshape(-1, 4)
        nl = np.asarray(res["labels"], np.int32)
        if min_visible > 0 and len(nb):
            h, w = res["image"].shape[:2]
            vis = (
                (nb[:, 2].clip(0, w) - nb[:, 0].clip(0, w))
                * (nb[:, 3].clip(0, h) - nb[:, 1].clip(0, h))
            ) / ((nb[:, 2] - nb[:, 0]) * (nb[:, 3] - nb[:, 1])).clip(min=1e-6)
            nb, nl = nb[vis >= min_visible], nl[vis >= min_visible]
        return res["image"], nb, nl

    return apply


def build_albu(transforms_cfg: list, min_visible: float = 0.0):
    """Build an albumentations Compose from a list of ``{"type": name,
    **kwargs}`` dicts (the reference Albu config schema) and wrap it.
    Raises a clear ImportError when the optional library is absent."""
    try:
        import albumentations as A
    except ImportError as e:  # pragma: no cover - env without the lib
        raise ImportError(
            "build_albu requires the optional 'albumentations' package; "
            "pass any compatible callable to albu_wrapper() instead"
        ) from e
    ts = [getattr(A, c["type"])(**{k: v for k, v in c.items() if k != "type"})
          for c in transforms_cfg]
    comp = A.Compose(
        ts, bbox_params=A.BboxParams(format="pascal_voc", label_fields=["labels"])
    )
    return albu_wrapper(comp, min_visible)

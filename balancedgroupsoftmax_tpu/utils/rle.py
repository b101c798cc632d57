"""COCO-compatible RLE mask codec + polygon rasterization (numpy/cv2).

Replaces the pycocotools mask utilities the reference's lvis-api depends on
(lvis-api/lvis/lvis.py ann_to_rle/ann_to_mask): column-major (Fortran) run
lengths and the base-48 LEB128-style compressed string format, implemented
from the published COCO format spec.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np


def mask_to_counts(mask: np.ndarray) -> List[int]:
    """Binary (H, W) mask -> column-major run-length counts (starting with
    the run of zeros)."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    if flat.size == 0:
        return [0]
    change = np.nonzero(np.diff(flat))[0] + 1
    runs = np.diff(np.concatenate([[0], change, [flat.size]])).tolist()
    if flat[0] == 1:  # counts must start with a zero-run
        runs = [0] + runs
    return [int(r) for r in runs]


def counts_to_mask(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((h, w), order="F")


def encode_counts(counts: Sequence[int]) -> str:
    """COCO compressed RLE string (rleToString semantics)."""
    out = []
    prev2 = prev1 = 0
    for i, cnt in enumerate(counts):
        x = int(cnt)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def decode_counts(s: str) -> List[int]:
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))  # sign-extend
            k += 1
        if len(counts) > 2:
            x += counts[-2]
        counts.append(int(x))
    return counts


def encode_mask(mask: np.ndarray) -> Dict:
    h, w = mask.shape
    return {"size": [int(h), int(w)], "counts": encode_counts(mask_to_counts(mask))}


def decode_rle(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = decode_counts(counts)
    return counts_to_mask(counts, h, w)


def rle_area(rle: Dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = decode_counts(counts)
    return int(sum(counts[1::2]))


def polygons_to_mask(polys: Sequence[Sequence[float]], h: int, w: int) -> np.ndarray:
    """Rasterize COCO polygon lists -> (H, W) uint8 mask."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2) for p in polys if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, [np.round(p).astype(np.int32) for p in pts], 1)
    return mask


def segmentation_to_mask(seg: Union[Dict, List], h: int, w: int) -> np.ndarray:
    """COCO `segmentation` field (polygons or RLE) -> binary mask."""
    if isinstance(seg, dict):
        return decode_rle(seg)
    return polygons_to_mask(seg, h, w)


def mask_iou(
    dts: Sequence[Dict], gts: Sequence[Dict], iscrowd: Sequence[int] | None = None
) -> np.ndarray:
    """(D, G) IoU between RLE masks (pycocotools mask.iou semantics)."""
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    dm = [decode_rle(d).astype(bool) for d in dts]
    gm = [decode_rle(g).astype(bool) for g in gts]
    if iscrowd is None:
        iscrowd = [0] * len(gts)
    out = np.zeros((len(dm), len(gm)))
    for i, d in enumerate(dm):
        for j, g in enumerate(gm):
            inter = np.logical_and(d, g).sum()
            if iscrowd[j]:
                union = d.sum()
            else:
                union = d.sum() + g.sum() - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out

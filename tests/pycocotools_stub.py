"""Functional pycocotools.mask stub backed by this repo's implementations.

The vendored lvis-api (/root/reference/lvis-api/lvis/{lvis,eval,results}.py)
does `import pycocotools.mask as mask_utils` at module import time and the
compiled pycocotools is absent from this image. Python caches that binding,
so WHICHEVER stub is installed when `lvis.*` is first imported is the one
every later test sees — the round-4 suite-order red came from
reference_loader installing a bare import-satisfying fake (iou=None) at
collection time and the real-fixture test then inheriting it.

Single source of truth: every test-side installer calls
install_functional_stub(), which is idempotent and always installs the
REAL implementations (bbox IoU via eval.box_iou_xywh, mask ops via
utils.rle), so import order can no longer matter.
"""

import sys
import types

import numpy as np


def install_functional_stub():
    existing = sys.modules.get("pycocotools.mask")
    if existing is not None and callable(getattr(existing, "iou", None)):
        return existing

    from balancedgroupsoftmax_tpu.eval.lvis_eval import box_iou_xywh
    from balancedgroupsoftmax_tpu.utils.rle import (
        counts_to_mask,
        decode_rle,
        encode_mask,
        mask_to_counts,
        polygons_to_mask,
        rle_area,
    )

    def _to_bitmap(obj):
        # RLE dict ({"size", "counts"}) in our codec's format
        return decode_rle(obj)

    def iou(dt, gt, iscrowd):
        if len(dt) == 0 or len(gt) == 0:
            return []  # pycocotools semantics: empty list, not (n, 0)
        if isinstance(dt[0], dict) or isinstance(gt[0], dict):
            dm = np.stack([_to_bitmap(d).reshape(-1) for d in dt]).astype(bool)
            gm = np.stack([_to_bitmap(g).reshape(-1) for g in gt]).astype(bool)
            inter = (dm[:, None, :] & gm[None, :, :]).sum(-1).astype(np.float64)
            da = dm.sum(-1).astype(np.float64)
            ga = gm.sum(-1).astype(np.float64)
            crowd = np.asarray(iscrowd, bool) if len(iscrowd) else np.zeros(len(gt), bool)
            union = np.where(
                crowd[None, :], da[:, None], da[:, None] + ga[None, :] - inter
            )
            return inter / np.maximum(union, 1e-12)
        return box_iou_xywh(dt, gt, iscrowd)

    def frPyObjects(pyobj, h, w):
        if isinstance(pyobj, list) and pyobj and isinstance(pyobj[0], list):
            # list of polygons -> list of RLEs (one per polygon)
            return [encode_mask(polygons_to_mask([p], h, w)) for p in pyobj]
        if isinstance(pyobj, dict) and isinstance(pyobj.get("counts"), list):
            return {
                "size": pyobj["size"],
                "counts": pyobj["counts"],
            }
        raise NotImplementedError(type(pyobj))

    def _uncompressed(r):
        h, w = r["size"]
        return counts_to_mask(r["counts"], h, w)

    def merge(rles, intersect=0):
        assert not intersect
        m = np.zeros(tuple(rles[0]["size"]), np.uint8)
        for r in rles:
            m |= decode_rle(r) if not isinstance(r["counts"], list) else _uncompressed(r)
        return encode_mask(m)

    def decode(rle):
        return (
            _uncompressed(rle)
            if isinstance(rle.get("counts"), list)
            else decode_rle(rle)
        )

    def area(rle):
        return rle_area(rle) if not isinstance(rle.get("counts"), list) else int(
            _uncompressed(rle).sum()
        )

    def toBbox(rle):
        m = decode(rle)
        ys, xs = np.nonzero(m)
        if len(xs) == 0:
            return np.zeros(4)
        return np.array(
            [xs.min(), ys.min(), xs.max() - xs.min() + 1, ys.max() - ys.min() + 1],
            np.float64,
        )

    pkg = sys.modules.get("pycocotools") or types.ModuleType("pycocotools")
    mask_mod = types.ModuleType("pycocotools.mask")
    mask_mod.iou = iou
    mask_mod.frPyObjects = frPyObjects
    mask_mod.merge = merge
    mask_mod.decode = decode
    mask_mod.area = area
    mask_mod.toBbox = toBbox
    pkg.mask = mask_mod
    sys.modules["pycocotools"] = pkg
    sys.modules["pycocotools.mask"] = mask_mod
    # keep the repo's encoder visible to the det synthesizer
    mask_mod._encode_mask = encode_mask
    mask_mod._mask_to_counts = mask_to_counts
    return mask_mod

"""VOC-style mAP and proposal recall evaluation (numpy).

Parity: /root/reference/mmdet/core/evaluation/mean_ap.py (`eval_map`,
`tpfp_default`, `average_precision` with 'area' and '11points' modes) and
recall.py (`eval_recalls`). Used by the non-LVIS dataset evaluations
(VOC/custom datasets) and proposal-recall diagnostics.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .lvis_eval import box_iou_xywh


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(m, n) IoU for xyxy boxes with the +1 convention (geometry.py)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: (x[:, 2] - x[:, 0] + 1) * (x[:, 3] - x[:, 1] + 1)
    return inter / np.maximum(area(a)[:, None] + area(b)[None, :] - inter, 1e-12)


def tpfp_default(
    det_bboxes: np.ndarray,  # (m, 5) xyxy + score
    gt_bboxes: np.ndarray,  # (n, 4)
    gt_ignore: Optional[np.ndarray] = None,  # (k, 4) ignore regions
    iou_thr: float = 0.5,
    area_ranges: Optional[Sequence[Tuple[float, float]]] = None,
):
    """(tp, fp) each (num_scales, m) — mean_ap.py:137-218 semantics."""
    if area_ranges is None:
        area_ranges = [(None, None)]
    num_scales = len(area_ranges)
    m = det_bboxes.shape[0]
    n = gt_bboxes.shape[0]
    tp = np.zeros((num_scales, m))
    fp = np.zeros((num_scales, m))

    if n == 0:
        for k, (min_a, max_a) in enumerate(area_ranges):
            if min_a is None:
                fp[k] = 1
            else:
                areas = (det_bboxes[:, 2] - det_bboxes[:, 0] + 1) * (
                    det_bboxes[:, 3] - det_bboxes[:, 1] + 1
                )
                fp[k, (areas >= min_a) & (areas < max_a)] = 1
        return tp, fp

    ious = _iou_xyxy(det_bboxes[:, :4], gt_bboxes)
    ious_max = ious.max(axis=1)
    ious_argmax = ious.argmax(axis=1)
    sort_inds = np.argsort(-det_bboxes[:, -1], kind="mergesort")
    gt_areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0] + 1) * (
        gt_bboxes[:, 3] - gt_bboxes[:, 1] + 1
    )
    for k, (min_a, max_a) in enumerate(area_ranges):
        covered = np.zeros(n, bool)
        if min_a is None:
            gt_scale_ignore = np.zeros(n, bool)
        else:
            gt_scale_ignore = (gt_areas < min_a) | (gt_areas >= max_a)
        for i in sort_inds:
            if ious_max[i] >= iou_thr:
                j = ious_argmax[i]
                if not gt_scale_ignore[j]:
                    if not covered[j]:
                        covered[j] = True
                        tp[k, i] = 1
                    else:
                        fp[k, i] = 1
                # matched to a scale-ignored gt: neither tp nor fp
            else:
                if min_a is None:
                    fp[k, i] = 1
                else:
                    area = (det_bboxes[i, 2] - det_bboxes[i, 0] + 1) * (
                        det_bboxes[i, 3] - det_bboxes[i, 1] + 1
                    )
                    if min_a <= area < max_a:
                        fp[k, i] = 1
    return tp, fp


def average_precision(recalls: np.ndarray, precisions: np.ndarray, mode="area"):
    """mean_ap.py average_precision parity."""
    recalls = recalls[np.newaxis, :] if recalls.ndim == 1 else recalls
    precisions = precisions[np.newaxis, :] if precisions.ndim == 1 else precisions
    num_scales = recalls.shape[0]
    ap = np.zeros(num_scales)
    if mode == "area":
        zeros = np.zeros((num_scales, 1))
        ones = np.ones((num_scales, 1))
        mrec = np.hstack((zeros, recalls, ones))
        mpre = np.hstack((zeros, precisions, zeros))
        for i in range(mpre.shape[1] - 1, 0, -1):
            mpre[:, i - 1] = np.maximum(mpre[:, i - 1], mpre[:, i])
        for k in range(num_scales):
            ind = np.where(mrec[k, 1:] != mrec[k, :-1])[0]
            ap[k] = np.sum((mrec[k, ind + 1] - mrec[k, ind]) * mpre[k, ind + 1])
    elif mode == "11points":
        for k in range(num_scales):
            for thr in np.arange(0, 1 + 1e-3, 0.1):
                precs = precisions[k, recalls[k, :] >= thr]
                ap[k] += precs.max() if precs.size else 0
        ap /= 11
    return ap


def eval_map(
    det_results: List[List[np.ndarray]],  # [img][class] -> (m, 5)
    gt_bboxes: List[np.ndarray],  # [img] -> (n, 4)
    gt_labels: List[np.ndarray],  # [img] -> (n,) 1-based
    iou_thr: float = 0.5,
    num_classes: Optional[int] = None,
) -> Tuple[float, List[Dict]]:
    """(mAP, per-class results) — eval_map (mean_ap.py:220+) core path."""
    if num_classes is None:
        num_classes = len(det_results[0])
    eval_results = []
    for c in range(num_classes):
        cls_dets, cls_gts = [], []
        for dets, gts, labels in zip(det_results, gt_bboxes, gt_labels):
            cls_dets.append(dets[c])
            cls_gts.append(gts[labels == c + 1] if len(gts) else gts.reshape(0, 4))
        tp_list, fp_list = [], []
        for d, g in zip(cls_dets, cls_gts):
            t, f = tpfp_default(d, g, iou_thr=iou_thr)
            tp_list.append(t)
            fp_list.append(f)
        num_gts = sum(len(g) for g in cls_gts)
        all_dets = np.vstack(cls_dets)
        num_dets = all_dets.shape[0]
        sort_inds = np.argsort(-all_dets[:, -1], kind="mergesort")
        tp = np.hstack([t[0] for t in tp_list])[sort_inds]
        fp = np.hstack([f[0] for f in fp_list])[sort_inds]
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(fp)
        eps = np.finfo(np.float32).eps
        recalls = tp_cum / max(num_gts, eps)
        precisions = tp_cum / np.maximum(tp_cum + fp_cum, eps)
        ap = average_precision(recalls, precisions)[0] if num_dets else 0.0
        eval_results.append(
            dict(num_gts=num_gts, num_dets=num_dets, ap=ap,
                 recall=recalls[-1] if num_dets and num_gts else 0.0)
        )
    valid = [r for r in eval_results if r["num_gts"] > 0]
    mean_ap = float(np.mean([r["ap"] for r in valid])) if valid else 0.0
    return mean_ap, eval_results


def eval_recalls(
    gts: List[np.ndarray],  # [img] -> (n, 4)
    proposals: List[np.ndarray],  # [img] -> (m, 4) or (m, 5) score-sorted
    proposal_nums: Sequence[int] = (100, 300, 1000),
    iou_thrs: Sequence[float] = (0.5,),
) -> np.ndarray:
    """(len(proposal_nums), len(iou_thrs)) recall matrix (recall.py parity)."""
    recalls = np.zeros((len(proposal_nums), len(iou_thrs)))
    total_gts = sum(len(g) for g in gts)
    if total_gts == 0:
        return recalls
    for pi, pn in enumerate(proposal_nums):
        for ti, thr in enumerate(iou_thrs):
            hit = 0
            for g, p in zip(gts, proposals):
                if len(g) == 0:
                    continue
                pp = p[:pn, :4] if len(p) else p.reshape(0, 4)
                if len(pp) == 0:
                    continue
                ious = _iou_xyxy(g, pp)
                hit += int((ious.max(axis=1) >= thr).sum())
            recalls[pi, ti] = hit / total_gts
    return recalls

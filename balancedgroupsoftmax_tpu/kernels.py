"""Kernel backend dispatch: Pallas on TPU, XLA reference elsewhere.

The Pallas kernels (pallas/roi_align.py, pallas/nms.py) are numerically
validated against the XLA formulations (ops/) which remain the portable
path (CPU tests, interpret-mode debugging). Selection happens at trace
time; override with BAGS_FORCE_XLA=1 / BAGS_FORCE_PALLAS=1.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def pallas_enabled() -> bool:
    if os.environ.get("BAGS_FORCE_XLA"):
        return False
    if os.environ.get("BAGS_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


def batched_multilevel_roi_align(
    feats: Sequence[jnp.ndarray],  # per level (B, H_l, W_l, C)
    rois: jnp.ndarray,  # (B, R, 4)
    strides: Sequence[int],
    out_size: int = 7,
    sample_num: int = 2,
    finest_scale: int = 56,
) -> jnp.ndarray:
    """(B, R, S, S, C) pooled features, routed per level."""
    if pallas_enabled():
        from .pallas.roi_align import multilevel_roi_align_pallas

        return multilevel_roi_align_pallas(
            tuple(feats), rois, tuple(strides), out_size, sample_num, finest_scale
        )
    from .ops.roi_align import multilevel_roi_align

    return jax.vmap(
        lambda per_img, rr: multilevel_roi_align(
            per_img, rr, strides, out_size, sample_num, finest_scale
        )
    )(tuple(feats), rois)


def batched_nms_topk(
    boxes: jnp.ndarray,  # (G, K, 4), rows score-descending
    scores: jnp.ndarray,  # (G, K)
    valid: jnp.ndarray,  # (G, K)
    iou_thr: float,
    max_out: int,
):
    """Greedy NMS per row + top-`max_out` kept, batched (RPN per-level path).

    Returns (boxes (G, max_out, 4), scores (G, max_out), valid (G, max_out)).
    """
    g, k = valid.shape
    kp = -(-k // 128) * 128
    # the full-adjacency Pallas kernel keeps a (K, K) iou+adj pair in VMEM:
    # only feasible up to K ~1280 (2 * K^2 * 4B <= ~14MB); larger rows
    # (train-time RPN nms_pre=2000) use the tile-sequential kernel whose
    # VMEM footprint is the (K, tile) strip
    if pallas_enabled() and kp * kp * 8 <= 14e6:
        from .pallas.nms import nms_keep_batched

        keep = nms_keep_batched(boxes, valid, iou_thr)
    elif pallas_enabled():
        from .pallas.nms import nms_keep_tiled

        keep = nms_keep_tiled(boxes, valid, iou_thr)
    else:
        from .ops.nms import nms_keep

        keep = jax.vmap(
            lambda b, v: nms_keep(b, jnp.zeros(k), v, iou_thr, presorted=True)
        )(boxes, valid)
    masked = jnp.where(keep & valid, scores, -jnp.inf)
    m = min(max_out, k)
    top, idx = jax.lax.top_k(masked, m)
    if m < max_out:
        top = jnp.pad(top, ((0, 0), (0, max_out - m)), constant_values=-jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, max_out - m)))
    out_valid = jnp.isfinite(top)
    out_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    return out_boxes, jnp.where(out_valid, top, 0.0), out_valid


def batched_multiclass_nms(
    boxes: jnp.ndarray,  # (B, N, 4) or (B, N, C*4)
    scores: jnp.ndarray,  # (B, N, C)
    valid: jnp.ndarray,  # (B, N)
    score_thr: float,
    iou_thr: float,
    max_per_img: int,
    candidates_per_class: int = 300,
    nms_type: str = "nms",
    soft_sigma: float = 0.5,
    soft_min_score: float = 1e-3,
    class_cap: int = 0,  # 0 = auto: exactly max_per_img (the exact minimum)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched per-class NMS + global top-k (ops/nms.multiclass_nms
    semantics over a leading batch dim). The per-class keep computation is
    flattened to (B*num_fg, K) so the Pallas kernel sees one large grid.

    When the class count exceeds `class_cap`, only the top `class_cap`
    classes per image (ranked by per-class max candidate score) enter NMS.
    This is EXACT for class_cap >= max_per_img: greedy NMS always keeps a
    class's highest-scoring candidate, so every selected class yields one
    survivor scoring >= every candidate of every dropped class — dropped
    classes can never reach the final top max_per_img. For LVIS this cuts
    the per-class NMS grid from 1231 to class_cap programs.

    nms_type='soft_nms' runs linear soft-NMS per class instead
    (the rcnn test option noted in the reference config,
    configs/bags/gs_faster...bg8.py:118-119) — scores decay rather than
    hard-suppress; the decayed scores feed the global top-k (the selected
    class's top candidate is picked first and never decayed, so the
    exactness argument above still holds)."""
    b, n, c = scores.shape
    num_fg = c - 1
    k = min(candidates_per_class, n)
    class_specific = boxes.shape[-1] != 4

    fg_scores = jnp.swapaxes(scores[..., 1:], 1, 2)  # (B, num_fg, N)
    masked = jnp.where(valid[:, None, :] & (fg_scores > score_thr), fg_scores, -jnp.inf)

    cap = max(class_cap, max_per_img)
    sel_cls = None
    if num_fg > cap:
        cls_max = jnp.max(masked, axis=-1)  # (B, num_fg)
        _, sel_cls = jax.lax.top_k(cls_max, cap)  # (B, cap)
        masked = jnp.take_along_axis(masked, sel_cls[..., None], axis=1)
        num_fg = cap

    top_scores, top_idx = jax.lax.top_k(masked, k)  # (B, num_fg, K)
    cand_valid = jnp.isfinite(top_scores)

    if nms_type != "soft_nms" and pallas_enabled():
        # Candidate selection through the one-hot-matmul gather kernel:
        # XLA's gather costs ~19.5 ms at the LVIS shape (1.8M 4-element
        # rows, any layout) vs ~1 ms of well-tiled transpose/row-gather +
        # the MXU selection (pallas/gather.py). Boxes are kept as
        # coordinate planes end-to-end; only the final max_per_img
        # winners are assembled as (M, 4) rows.
        from .pallas.gather import gather_lanes_matmul
        from .pallas.nms import nms_keep_batched_coords, nms_keep_gathered

        if class_specific:
            pc = jnp.transpose(boxes.reshape(b, n, c, 4), (0, 2, 3, 1))
            cls_take = (
                sel_cls
                if sel_cls is not None
                else jnp.arange(num_fg, dtype=jnp.int32)[None, :].repeat(b, 0)
            ) + 1  # fg slot -> class index (bg is class 0)
            sel_pl = jnp.take_along_axis(
                pc, cls_take[..., None, None], axis=1
            )  # (B, num_fg, 4, N)
            keep, cand4 = nms_keep_gathered(
                sel_pl.reshape(b * num_fg, 4, n),
                top_idx.reshape(b * num_fg, k),
                cand_valid.reshape(b * num_fg, k),
                iou_thr,
            )
            keep = keep.reshape(b, num_fg, k)
            cand4 = cand4.reshape(b, num_fg, 4, k)
        else:
            # shared plane per image: the standalone gather kernel reuses
            # one plane block across a class's groups (no replication);
            # the fused kernel would need the plane materialized per group
            planes = jnp.swapaxes(boxes, 1, 2)  # (B, 4, N)
            cand4 = gather_lanes_matmul(
                planes,
                top_idx.reshape(b * num_fg, k),
                groups_per_plane=num_fg,
            ).reshape(b, num_fg, 4, k)
            keep = nms_keep_batched_coords(
                cand4.reshape(b * num_fg, 4, k),
                cand_valid.reshape(b * num_fg, k),
                iou_thr,
            ).reshape(b, num_fg, k)
        cand_scores = jnp.where(keep & cand_valid, top_scores, -jnp.inf).reshape(b, -1)
        out_scores, flat_idx = jax.lax.top_k(cand_scores, max_per_img)  # (B, M)
        det_valid = jnp.isfinite(out_scores)
        cls_idx = (flat_idx // k).astype(jnp.int32)
        slot_idx = flat_idx % k
        det_boxes = jax.vmap(
            lambda c4, ci, si: c4[ci, :, si]
        )(cand4, cls_idx, slot_idx)  # (B, M, 4)
        if sel_cls is not None:  # map capped class slots back to real labels
            cls_idx = jnp.take_along_axis(sel_cls, cls_idx, axis=1).astype(jnp.int32)
        return (
            det_boxes,
            jnp.where(det_valid, out_scores, 0.0),
            cls_idx,
            det_valid,
        )

    if class_specific:
        per_class = jnp.swapaxes(boxes.reshape(b, n, c, 4)[..., 1:, :], 1, 2)
        if sel_cls is not None:
            per_class = jnp.take_along_axis(
                per_class, sel_cls[..., None, None], axis=1
            )
        cand_boxes = jnp.take_along_axis(per_class, top_idx[..., None], axis=2)
    else:
        cand_boxes = jax.vmap(lambda bx, ix: bx[ix])(
            boxes, top_idx.reshape(b, -1)
        ).reshape(b, num_fg, k, 4)

    if nms_type == "soft_nms":
        from .ops.nms import soft_nms

        flat = lambda x: x.reshape(b * num_fg, *x.shape[2:])
        sb, ss, sv = jax.vmap(
            lambda bb, sc, vv: soft_nms(
                bb, sc, vv, iou_thr=iou_thr, method="linear",
                sigma=soft_sigma, min_score=soft_min_score, max_out=k,
            )
        )(flat(cand_boxes), flat(jnp.where(cand_valid, top_scores, 0.0)),
          flat(cand_valid))
        cand_boxes = sb.reshape(b, num_fg, k, 4)
        top_scores = ss.reshape(b, num_fg, k)
        keep = sv.reshape(b, num_fg, k)
        cand_valid = keep
    else:
        from .ops.nms import nms_keep

        flat_boxes = cand_boxes.reshape(b * num_fg, k, 4)
        flat_valid = cand_valid.reshape(b * num_fg, k)
        keep = jax.vmap(
            lambda bb, vv: nms_keep(bb, jnp.zeros(k), vv, iou_thr, presorted=True)
        )(flat_boxes, flat_valid).reshape(b, num_fg, k)

    cand_scores = jnp.where(keep & cand_valid, top_scores, -jnp.inf).reshape(b, -1)
    out_scores, flat_idx = jax.lax.top_k(cand_scores, max_per_img)  # (B, M)
    det_valid = jnp.isfinite(out_scores)
    cls_idx = (flat_idx // k).astype(jnp.int32)
    slot_idx = flat_idx % k
    det_boxes = jax.vmap(lambda cb, ci, si: cb[ci, si])(cand_boxes, cls_idx, slot_idx)
    if sel_cls is not None:  # map capped class slots back to real labels
        cls_idx = jnp.take_along_axis(sel_cls, cls_idx, axis=1).astype(jnp.int32)
    return (
        det_boxes,
        jnp.where(det_valid, out_scores, 0.0),
        cls_idx,
        det_valid,
    )

"""Anchor and RoI target computation with static shapes (single image).

Parity: /root/reference/mmdet/core/anchor/anchor_target.py and
/root/reference/mmdet/core/bbox/bbox_target.py. The reference subsets
"inside" anchors, assigns, samples, then unmaps back to the full anchor set;
here assignment runs over *all* anchors with the inside mask folded into the
assigner's proposal mask, so no unmap is needed and shapes stay static.

Batch handling is `jax.vmap` over these single-image functions.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import RCNNTrainConfig, RPNTrainConfig
from ..ops.boxes import bbox2delta
from .assigner import assign_max_iou
from .sampler import add_gt_as_proposals, sample_pos_neg


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray  # (N,) int32 — 1 for RPN positives, 0 otherwise
    label_weights: jnp.ndarray  # (N,) float32 — 1 on sampled anchors
    bbox_targets: jnp.ndarray  # (N, 4) float32
    bbox_weights: jnp.ndarray  # (N, 4) float32 — 1 on positives
    num_pos: jnp.ndarray  # () int32 (clamped to >= 1, anchor_target.py:68)
    num_neg: jnp.ndarray  # () int32 (clamped to >= 1)


def anchor_targets_single(
    key: jax.Array,
    anchors: jnp.ndarray,  # (N, 4) all-level anchors, concatenated
    valid_mask: jnp.ndarray,  # (N,) bool — grid validity for this image
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_mask: jnp.ndarray,  # (G,) bool
    img_shape: Tuple[int, int],  # (H, W) of the un-padded image content
    cfg: RPNTrainConfig,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> AnchorTargets:
    img_h, img_w = img_shape
    border = cfg.allowed_border
    if border >= 0:
        inside = (
            valid_mask
            & (anchors[:, 0] >= -border)
            & (anchors[:, 1] >= -border)
            & (anchors[:, 2] < img_w + border)
            & (anchors[:, 3] < img_h + border)
        )
    else:
        inside = valid_mask

    assign = assign_max_iou(
        anchors,
        inside,
        gt_boxes,
        jnp.ones(gt_boxes.shape[0], dtype=jnp.int32),  # labels unused for RPN
        gt_mask,
        pos_iou_thr=cfg.assigner.pos_iou_thr,
        neg_iou_thr=cfg.assigner.neg_iou_thr,
        min_pos_iou=cfg.assigner.min_pos_iou,
        gt_max_assign_all=cfg.assigner.gt_max_assign_all,
    )
    samp = sample_pos_neg(key, assign, cfg.sampler.num, cfg.sampler.pos_fraction)

    n = anchors.shape[0]
    labels = jnp.zeros(n, dtype=jnp.int32)
    label_weights = jnp.zeros(n, dtype=jnp.float32)
    bbox_targets = jnp.zeros((n, 4), dtype=jnp.float32)
    bbox_weights = jnp.zeros((n, 4), dtype=jnp.float32)

    pos_slots = samp.is_pos & samp.valid
    neg_slots = samp.valid & ~samp.is_pos
    pos_weight = 1.0 if cfg.pos_weight <= 0 else cfg.pos_weight

    labels = labels.at[samp.inds].add(jnp.where(pos_slots, 1, 0))
    label_weights = label_weights.at[samp.inds].add(
        jnp.where(pos_slots, pos_weight, jnp.where(neg_slots, 1.0, 0.0))
    )

    gt_idx = jnp.clip(assign.gt_inds[samp.inds] - 1, 0, gt_boxes.shape[0] - 1)
    deltas = bbox2delta(
        anchors[samp.inds], gt_boxes[gt_idx], target_means, target_stds
    )
    bbox_targets = bbox_targets.at[samp.inds].add(
        jnp.where(pos_slots[:, None], deltas, 0.0)
    )
    bbox_weights = bbox_weights.at[samp.inds].add(
        jnp.where(pos_slots[:, None], 1.0, 0.0)
    )
    return AnchorTargets(
        labels=labels,
        label_weights=label_weights,
        bbox_targets=bbox_targets,
        bbox_weights=bbox_weights,
        num_pos=jnp.maximum(samp.num_pos, 1),
        num_neg=jnp.maximum(samp.num_neg, 1),
    )


class RoITargets(NamedTuple):
    rois: jnp.ndarray  # (S, 4) sampled boxes
    roi_valid: jnp.ndarray  # (S,) bool
    labels: jnp.ndarray  # (S,) int32 — gt class (1-based) for pos, 0 for neg
    label_weights: jnp.ndarray  # (S,) float32
    bbox_targets: jnp.ndarray  # (S, 4)
    bbox_weights: jnp.ndarray  # (S, 4)
    pos_gt_inds: jnp.ndarray  # (S,) int32 0-based assigned-gt index (pos slots)
    num_pos: jnp.ndarray  # () int32
    num_neg: jnp.ndarray  # () int32


def roi_targets_single(
    key: jax.Array,
    proposals: jnp.ndarray,  # (P, 4)
    prop_mask: jnp.ndarray,  # (P,) bool
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,) int32, 1-based
    gt_mask: jnp.ndarray,  # (G,) bool
    cfg: RCNNTrainConfig,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(0.1, 0.1, 0.2, 0.2),
) -> RoITargets:
    """Assign + sample + encode targets for the RCNN stage (one image).

    Output capacity S = cfg.sampler.num, positives first
    (bbox_target.py:43-59).
    """
    assign = assign_max_iou(
        proposals,
        prop_mask,
        gt_boxes,
        gt_labels,
        gt_mask,
        pos_iou_thr=cfg.assigner.pos_iou_thr,
        neg_iou_thr=cfg.assigner.neg_iou_thr,
        min_pos_iou=cfg.assigner.min_pos_iou,
        gt_max_assign_all=cfg.assigner.gt_max_assign_all,
    )
    boxes, mask, assign = (
        add_gt_as_proposals(proposals, prop_mask, assign, gt_boxes, gt_labels, gt_mask)
        if cfg.sampler.add_gt_as_proposals
        else (proposals, prop_mask, assign)
    )
    samp = sample_pos_neg(key, assign, cfg.sampler.num, cfg.sampler.pos_fraction)

    rois = boxes[samp.inds]
    pos_slots = samp.is_pos & samp.valid
    labels = jnp.where(pos_slots, assign.labels[samp.inds], 0).astype(jnp.int32)
    pos_weight = 1.0 if cfg.pos_weight <= 0 else cfg.pos_weight
    label_weights = jnp.where(
        pos_slots, pos_weight, jnp.where(samp.valid, 1.0, 0.0)
    ).astype(jnp.float32)

    gt_idx = jnp.clip(assign.gt_inds[samp.inds] - 1, 0, gt_boxes.shape[0] - 1)
    deltas = bbox2delta(rois, gt_boxes[gt_idx], target_means, target_stds)
    bbox_targets = jnp.where(pos_slots[:, None], deltas, 0.0)
    bbox_weights = jnp.where(pos_slots[:, None], 1.0, 0.0)
    return RoITargets(
        rois=rois,
        roi_valid=samp.valid,
        labels=labels,
        label_weights=label_weights,
        bbox_targets=bbox_targets,
        bbox_weights=bbox_weights,
        pos_gt_inds=gt_idx.astype(jnp.int32),
        num_pos=samp.num_pos,
        num_neg=samp.num_neg,
    )

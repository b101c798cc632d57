"""Max-IoU assignment over fixed-capacity padded boxes.

Parity: /root/reference/mmdet/core/bbox/assigners/max_iou_assigner.py.
The reference's 4-step rule (assign -1 → negatives below neg_iou_thr →
positives above pos_iou_thr → each GT claims its best-overlap proposals)
is reproduced with masked vector ops instead of boolean indexing, so the
whole assignment jits to static shapes and vmaps over the batch.

Conventions:
- `gt_inds`: -1 ignore, 0 negative, >0 = 1-based GT index (reference
  max_iou_assigner.py:12-16).
- Padded GT rows (gt_mask False) never match: their overlap rows are forced
  to -1 so no proposal is assigned to them, matching the reference where
  padded GTs simply don't exist.
- Padded proposals (prop_mask False) are forced to ignore (-1): they can
  never be sampled.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.boxes import bbox_overlaps


class AssignResult(NamedTuple):
    gt_inds: jnp.ndarray  # (N,) int32: -1 ignore / 0 neg / 1-based gt index
    max_overlaps: jnp.ndarray  # (N,) float32
    labels: jnp.ndarray  # (N,) int32 class label of assigned gt (0 if none)


def assign_max_iou(
    proposals: jnp.ndarray,  # (N, 4)
    prop_mask: jnp.ndarray,  # (N,) bool
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,) int32, 1-based class ids
    gt_mask: jnp.ndarray,  # (G,) bool
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float = 0.0,
    gt_max_assign_all: bool = True,
) -> AssignResult:
    """Vectorized 4-step max-IoU assignment (single image)."""
    overlaps = bbox_overlaps(gt_boxes, proposals)  # (G, N)
    # Padded GTs and padded proposals get overlap -1 (below every threshold).
    overlaps = jnp.where(gt_mask[:, None] & prop_mask[None, :], overlaps, -1.0)

    max_overlaps = overlaps.max(axis=0)  # (N,) per-proposal best IoU
    argmax_overlaps = overlaps.argmax(axis=0)  # (N,)
    gt_max_overlaps = overlaps.max(axis=1)  # (G,) per-gt best IoU

    # step 1-2: default -1, negatives in [0, neg_iou_thr)
    gt_inds = jnp.full(proposals.shape[:1], -1, dtype=jnp.int32)
    gt_inds = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), 0, gt_inds
    )
    # step 3: positives above pos_iou_thr -> 1-based argmax gt
    gt_inds = jnp.where(
        max_overlaps >= pos_iou_thr, argmax_overlaps.astype(jnp.int32) + 1, gt_inds
    )
    # step 4: each gt claims proposals tying its best overlap (if >= min_pos_iou).
    # The reference iterates gts in order, so a later gt overrides an earlier
    # one on the same proposal. Reproduce with a masked "last claiming gt" scan:
    # claim[g, n] = gt g claims proposal n.
    claim = (overlaps == gt_max_overlaps[:, None]) & (
        gt_max_overlaps[:, None] >= min_pos_iou
    ) & gt_mask[:, None] & prop_mask[None, :] & (gt_max_overlaps[:, None] > -1.0)
    if not gt_max_assign_all:
        # only the single argmax proposal per gt claims
        best = jnp.argmax(overlaps, axis=1)
        onehot = jnp.zeros_like(claim).at[jnp.arange(claim.shape[0]), best].set(True)
        claim = claim & onehot
    # last gt (highest g) claiming proposal n wins
    g_idx = jnp.arange(claim.shape[0], dtype=jnp.int32)[:, None]
    claimed_by = jnp.max(jnp.where(claim, g_idx + 1, 0), axis=0)  # (N,) 0 = none
    gt_inds = jnp.where(claimed_by > 0, claimed_by, gt_inds)

    # padded proposals are never usable
    gt_inds = jnp.where(prop_mask, gt_inds, -1)

    labels = jnp.where(
        gt_inds > 0,
        gt_labels[jnp.clip(gt_inds - 1, 0, gt_labels.shape[0] - 1)],
        0,
    ).astype(jnp.int32)
    return AssignResult(gt_inds=gt_inds, max_overlaps=max_overlaps, labels=labels)

"""RPN head: module, loss, and static-shape proposal generation.

Parity: /root/reference/mmdet/models/anchor_heads/rpn_head.py and
anchor_head.py. The reference's per-level dynamic pipeline (topk → decode →
CUDA NMS → cat → topk, rpn_head.py:55-104) becomes fixed-capacity tensor ops:
every level yields exactly `nms_post` (masked) proposals, levels concatenate
to a static candidate set, and a final top-k keeps `max_num`.

Anchor layout contract: NHWC score maps flattened as (H, W, A) match the
location-major anchors from core/anchors.py — same ordering as the
reference's permute(1,2,0).reshape(-1) (rpn_head.py:69-76).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ProposalConfig, RPNTrainConfig
from ..ops.boxes import delta2bbox
from ..ops.losses import binary_cross_entropy_with_logits, smooth_l1
from ..ops.nms import nms
from ..core.targets import AnchorTargets, anchor_targets_single


class RPNHead(nn.Module):
    feat_channels: int = 256
    num_anchors: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """Returns per-level (cls_logits (..., H, W, A), deltas (..., H, W, A*4))."""
        conv = nn.Conv(
            self.feat_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="rpn_conv",
        )
        cls = nn.Conv(
            self.num_anchors,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="rpn_cls",
        )
        reg = nn.Conv(
            self.num_anchors * 4,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="rpn_reg",
        )
        outs = []
        for x in feats:
            y = nn.relu(conv(x))
            outs.append((cls(y), reg(y)))
        return outs


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # (P, 4)
    scores: jnp.ndarray  # (P,)
    valid: jnp.ndarray  # (P,) bool


def rpn_proposals_batched(
    level_outs,  # per level ((B, H, W, A), (B, H, W, A*4))
    anchors: Sequence[jnp.ndarray],  # per level (H*W*A, 4)
    img_shapes: jnp.ndarray,  # (B, 2) content (h, w)
    cfg: ProposalConfig,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> Proposals:
    """Batched proposal generation: per-level top-k + batched NMS kernel.

    Same semantics as vmap(rpn_proposals_single) but the per-level NMS runs
    through kernels.batched_nms_topk — one (B*L)-row kernel launch instead
    of the (B, L)-vmapped XLA fixpoint (the RPN hot spot at inference).
    """
    from ..kernels import batched_nms_topk

    b = level_outs[0][0].shape[0]
    lvl_boxes, lvl_scores, lvl_valid = [], [], []
    hmax = img_shapes[:, 0]
    wmax = img_shapes[:, 1]
    for (cls_map, reg_map), anc in zip(level_outs, anchors):
        scores = jax.nn.sigmoid(cls_map.astype(jnp.float32).reshape(b, -1))
        deltas = reg_map.astype(jnp.float32).reshape(b, -1, 4)
        n = scores.shape[1]
        k = min(cfg.nms_pre, n)
        top_scores, top_idx = jax.lax.top_k(scores, k)  # (B, K) sorted desc
        top_deltas = jnp.take_along_axis(deltas, top_idx[..., None], axis=1)
        top_anchors = anc[top_idx]
        boxes = delta2bbox(top_anchors, top_deltas, target_means, target_stds)
        # per-image clip to content region
        boxes = jnp.stack(
            [
                jnp.clip(boxes[..., 0], 0, wmax[:, None] - 1),
                jnp.clip(boxes[..., 1], 0, hmax[:, None] - 1),
                jnp.clip(boxes[..., 2], 0, wmax[:, None] - 1),
                jnp.clip(boxes[..., 3], 0, hmax[:, None] - 1),
            ],
            axis=-1,
        )
        valid = jnp.ones((b, k), bool)
        if cfg.min_bbox_size > 0:
            w = boxes[..., 2] - boxes[..., 0] + 1
            h = boxes[..., 3] - boxes[..., 1] + 1
            valid &= (w >= cfg.min_bbox_size) & (h >= cfg.min_bbox_size)
        nb, ns, nv = batched_nms_topk(boxes, top_scores, valid, cfg.nms_thr, cfg.nms_post)
        lvl_boxes.append(nb)
        lvl_scores.append(ns)
        lvl_valid.append(nv)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)
    valid = jnp.concatenate(lvl_valid, axis=1)
    masked = jnp.where(valid, scores, -jnp.inf)
    top, idx = jax.lax.top_k(masked, cfg.max_num)
    out_valid = jnp.isfinite(top)
    return Proposals(
        boxes=jnp.take_along_axis(boxes, idx[..., None], axis=1),
        scores=jnp.where(out_valid, top, 0.0),
        valid=out_valid,
    )


def rpn_proposals_single(
    level_outs: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],  # per level (H,W,A), (H,W,A*4)
    anchors: Sequence[jnp.ndarray],  # per level (H*W*A, 4)
    img_shape: Tuple[int, int],
    cfg: ProposalConfig,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> Proposals:
    """Generate proposals for one image (rpn_head.py:55-104 parity)."""
    lvl_boxes: List[jnp.ndarray] = []
    lvl_scores: List[jnp.ndarray] = []
    lvl_valid: List[jnp.ndarray] = []
    for (cls_map, reg_map), anc in zip(level_outs, anchors):
        scores = jax.nn.sigmoid(cls_map.astype(jnp.float32).reshape(-1))
        deltas = reg_map.astype(jnp.float32).reshape(-1, 4)
        n = scores.shape[0]
        k = min(cfg.nms_pre, n)
        top_scores, top_idx = jax.lax.top_k(scores, k)
        top_deltas = deltas[top_idx]
        top_anchors = anc[top_idx]
        boxes = delta2bbox(
            top_anchors, top_deltas, target_means, target_stds, max_shape=img_shape
        )
        valid = jnp.ones(k, dtype=bool)
        if cfg.min_bbox_size > 0:
            w = boxes[:, 2] - boxes[:, 0] + 1
            h = boxes[:, 3] - boxes[:, 1] + 1
            valid &= (w >= cfg.min_bbox_size) & (h >= cfg.min_bbox_size)
        b, s, v = nms(boxes, top_scores, valid, cfg.nms_thr, cfg.nms_post)
        lvl_boxes.append(b)
        lvl_scores.append(s)
        lvl_valid.append(v)

    boxes = jnp.concatenate(lvl_boxes, axis=0)
    scores = jnp.concatenate(lvl_scores, axis=0)
    valid = jnp.concatenate(lvl_valid, axis=0)
    # nms_across_levels=False in all shipped configs: plain global top-k
    masked = jnp.where(valid, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(masked, cfg.max_num)
    out_valid = jnp.isfinite(top_scores)
    return Proposals(
        boxes=boxes[idx],
        scores=jnp.where(out_valid, top_scores, 0.0),
        valid=out_valid,
    )


def rpn_loss(
    level_outs_batch,  # per level (B, H, W, A), (B, H, W, A*4)
    anchors_flat: jnp.ndarray,  # (N, 4) all levels concatenated
    anchor_valid: jnp.ndarray,  # (N,) bool grid validity
    gt_boxes: jnp.ndarray,  # (B, G, 4)
    gt_mask: jnp.ndarray,  # (B, G) bool
    img_shapes: Tuple[int, int],  # static padded (H, W) bucket
    keys: jax.Array,  # (B,) PRNG keys
    cfg: RPNTrainConfig,
    beta: float = 1.0 / 9.0,
):
    """Batched RPN loss (anchor_head.py:162-208 parity, sigmoid cls)."""
    targets: AnchorTargets = jax.vmap(
        lambda k, gb, gm: anchor_targets_single(
            k, anchors_flat, anchor_valid, gb, gm, img_shapes, cfg
        )
    )(keys, gt_boxes, gt_mask)

    cls_logits = jnp.concatenate(
        [c.astype(jnp.float32).reshape(c.shape[0], -1) for c, _ in level_outs_batch],
        axis=1,
    )  # (B, N)
    deltas = jnp.concatenate(
        [r.astype(jnp.float32).reshape(r.shape[0], -1, 4) for _, r in level_outs_batch],
        axis=1,
    )  # (B, N, 4)

    num_total = jnp.sum(targets.num_pos) + jnp.sum(targets.num_neg)
    loss_cls = binary_cross_entropy_with_logits(
        cls_logits,
        targets.labels.astype(jnp.float32),
        weight=targets.label_weights,
        avg_factor=num_total,
    )
    loss_bbox = smooth_l1(
        deltas,
        targets.bbox_targets,
        beta=beta,
        weight=targets.bbox_weights,
        avg_factor=num_total,
    )
    return loss_cls, loss_bbox

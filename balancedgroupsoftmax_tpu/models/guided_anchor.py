"""Guided Anchoring RPN (GA-RPN).

Parity: /root/reference/mmdet/models/anchor_heads/guided_anchor_head.py +
ga_rpn_head.py and core/anchor/guided_anchor_target.py — each location
predicts (a) an objectness *location* mask, (b) an anchor *shape* (dw, dh
on a square base), features are adapted by a deformable conv driven by the
predicted shape, and a standard cls/reg pair runs on the adapted features
with the *generated* anchors. Targets:
- loc: center region of each GT (sigma_center-scaled) positive, a larger
  ignore ring excluded (ga_loc_target);
- shape: IoU-maximizing (dw, dh) for the GT assigned by center coverage —
  trained with a bounded-IoU style loss on the decoded anchor;
- cls/reg: max-IoU assignment on the generated anchors (RPN recipe).

Sparse masked conv of the reference (MaskedConv2d over predicted locations)
is realized as dense conv x mask — the XLA-fused equivalent
(ops/roi_pool.masked_conv2d rationale).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ProposalConfig
from ..core.assigner import assign_max_iou
from ..kernels import batched_nms_topk
from ..ops.boxes import bbox2delta, bbox_overlaps, delta2bbox
from ..ops.deform_conv import deform_conv2d
from ..ops.losses import binary_cross_entropy_with_logits, sigmoid_focal_loss, smooth_l1
from .fcos import _points
from .rpn import Proposals


@dataclasses.dataclass(frozen=True)
class GAConfig:
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    octave_base: float = 8.0  # square anchor base = octave_base * stride
    sigma_center: float = 0.2
    sigma_ignore: float = 0.5
    feat_channels: int = 256
    loc_filter_thr: float = 0.01
    image_size: Tuple[int, int] = (800, 1344)


class GuidedAnchorRPN(nn.Module):
    cfg: GAConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        c = self.cfg
        ch = c.feat_channels
        conv_loc = nn.Conv(1, (1, 1), kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(-4.595),
                           dtype=self.dtype, name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1), kernel_init=nn.initializers.normal(0.01),
                             dtype=self.dtype, name="conv_shape")
        offset_conv = nn.Conv(2 * 9, (1, 1), kernel_init=nn.initializers.zeros,
                              dtype=self.dtype, name="feature_adaption_offset")
        adapt_w = self.param(
            "feature_adaption_kernel", nn.initializers.normal(0.01), (3, 3, ch, ch)
        )
        rpn_cls = nn.Conv(1, (1, 1), kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name="ga_rpn_cls")
        rpn_reg = nn.Conv(4, (1, 1), kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name="ga_rpn_reg")
        outs = []
        for x in feats:
            loc = conv_loc(x)
            shape = conv_shape(x)
            off = offset_conv(jax.lax.stop_gradient(shape)).astype(jnp.float32)
            adapted = jax.vmap(
                lambda xi, oi: deform_conv2d(xi, oi, adapt_w)
            )(x, off)
            adapted = nn.relu(adapted.astype(self.dtype))
            outs.append((loc, shape, rpn_cls(adapted), rpn_reg(adapted)))
        return outs


def _generated_anchors(shape_pred, points, stride, octave_base):
    """(N, 2) shape deltas + (N, 2) centers -> (N, 4) anchors.

    w = base * stride * exp(dw) (guided_anchor_head.py anchor generation)."""
    base = octave_base * stride
    w = base * jnp.exp(jnp.clip(shape_pred[:, 0], -4.0, 4.0))
    h = base * jnp.exp(jnp.clip(shape_pred[:, 1], -4.0, 4.0))
    return jnp.stack(
        [points[:, 0] - (w - 1) / 2, points[:, 1] - (h - 1) / 2,
         points[:, 0] + (w - 1) / 2, points[:, 1] + (h - 1) / 2], axis=-1,
    )


def ga_loc_targets(points, strides_per_pt, lvl_of_pt, gt_boxes, gt_mask, cfg: GAConfig):
    """(N,) loc labels {1 pos, 0 neg, -1 ignore} — ga_loc_target semantics:
    positive inside the sigma_center-scaled GT on the GT's own level,
    ignored inside the sigma_ignore region (all levels adjacency simplified
    to the matched level)."""
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    gw = gt_boxes[:, 2] - gt_boxes[:, 0] + 1
    gh = gt_boxes[:, 3] - gt_boxes[:, 1] + 1
    scale = jnp.sqrt(gw * gh)

    def region(s):
        inx = jnp.abs(points[:, 0][:, None] - cx[None, :]) < (s * gw / 2)[None, :]
        iny = jnp.abs(points[:, 1][:, None] - cy[None, :]) < (s * gh / 2)[None, :]
        return inx & iny & gt_mask[None, :]

    gt_lvl = jnp.clip(
        jnp.floor(jnp.log2(scale / (cfg.octave_base * cfg.strides[0]) + 1e-6)),
        0, len(cfg.strides) - 1,
    ).astype(jnp.int32)
    same_lvl = lvl_of_pt[:, None] == gt_lvl[None, :]
    pos = (region(cfg.sigma_center) & same_lvl).any(axis=1)
    ign = (region(cfg.sigma_ignore) & same_lvl).any(axis=1) & ~pos
    return jnp.where(pos, 1, jnp.where(ign, -1, 0)).astype(jnp.int32)


class GARPN(nn.Module):
    """Standalone GA-RPN producing proposals (ga_rpn_head.py)."""

    cfg: GAConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from .fpn import FPN
        from .resnet import ResNet

        self.backbone = ResNet(depth=50, dtype=self.dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5, dtype=self.dtype, name="neck")
        self.head = GuidedAnchorRPN(self.cfg, dtype=self.dtype, name="rpn_head")

    def extract(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images):
        return self.head(self.extract(images))

    def _meta(self, images):
        c = self.cfg
        # grid sizes from the ACTUAL padded batch (portrait buckets would
        # otherwise get a transposed point grid; see detector._anchors)
        h, w = images.shape[1], images.shape[2]
        pts, strides, lvls = [], [], []
        for li, s in enumerate(c.strides):
            lh, lw = -(-h // s), -(-w // s)
            pts.append(_points(lh, lw, s))
            strides.append(np.full(lh * lw, s, np.float32))
            lvls.append(np.full(lh * lw, li, np.int32))
        return (
            jnp.asarray(np.concatenate(pts)),
            jnp.asarray(np.concatenate(strides)),
            jnp.asarray(np.concatenate(lvls)),
        )

    def loss(self, images, gt_boxes, gt_labels, gt_mask, img_shapes) -> Dict:
        c = self.cfg
        b = images.shape[0]
        outs = self.head(self.extract(images))
        points, strides, lvls = self._meta(images)

        loc_logits = jnp.concatenate(
            [o[0].astype(jnp.float32).reshape(b, -1) for o in outs], axis=1
        )
        shape_pred = jnp.concatenate(
            [o[1].astype(jnp.float32).reshape(b, -1, 2) for o in outs], axis=1
        )
        cls_logits = jnp.concatenate(
            [o[2].astype(jnp.float32).reshape(b, -1) for o in outs], axis=1
        )
        reg_pred = jnp.concatenate(
            [o[3].astype(jnp.float32).reshape(b, -1, 4) for o in outs], axis=1
        )

        def one_image(sp, gb, gm):
            loc_t = ga_loc_targets(points, strides, lvls, gb, gm, c)
            anchors = _generated_anchors(sp.reshape(-1, 2), points, strides, c.octave_base)
            # shape targets: at loc-positive points, fit the covering gt
            ious = bbox_overlaps(anchors, gb)  # (N, G)
            ious = jnp.where(gm[None, :], ious, -1.0)
            best_gt = jnp.argmax(ious, axis=1)
            shape_tgt = gb[best_gt]
            # cls/reg on generated anchors: standard RPN assignment
            assign = assign_max_iou(
                jax.lax.stop_gradient(anchors), jnp.ones(anchors.shape[0], bool),
                gb, jnp.ones_like(gm, jnp.int32), gm,
                pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
            )
            pos = assign.gt_inds > 0
            neg = assign.gt_inds == 0
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gb.shape[0] - 1)
            deltas = bbox2delta(jax.lax.stop_gradient(anchors), gb[gt_idx])
            return loc_t, anchors, shape_tgt, pos, neg, deltas

        loc_t, anchors, shape_tgt, pos, neg, deltas_t = jax.vmap(one_image)(
            shape_pred, gt_boxes, gt_mask
        )

        num_loc_pos = jnp.maximum(jnp.sum(loc_t == 1), 1.0)
        loss_loc = sigmoid_focal_loss(
            loc_logits, (loc_t == 1).astype(jnp.float32),
            weight=(loc_t >= 0).astype(jnp.float32), avg_factor=num_loc_pos,
        )
        # shape loss: IoU of the generated anchor with its best gt at loc
        # positives (bounded-iou-loss stand-in: 1 - IoU)
        ious = jax.vmap(lambda a, g: bbox_overlaps(a, g, is_aligned=True))(
            anchors, shape_tgt
        )
        wl = (loc_t == 1).astype(jnp.float32)
        loss_shape = jnp.sum((1.0 - ious) * wl) / num_loc_pos
        num_pos = jnp.maximum(jnp.sum(pos), 1.0)
        loss_cls = binary_cross_entropy_with_logits(
            cls_logits, pos.astype(jnp.float32),
            weight=(pos | neg).astype(jnp.float32),
            avg_factor=num_pos + jnp.sum(neg),
        )
        loss_reg = smooth_l1(
            reg_pred, deltas_t, beta=1.0 / 9.0,
            weight=pos[..., None].astype(jnp.float32), avg_factor=num_pos,
        )
        return {
            "loss_loc": loss_loc, "loss_shape": loss_shape,
            "loss_cls": loss_cls, "loss_bbox": loss_reg,
        }

    def propose(self, images, img_shapes, cfg: ProposalConfig) -> Proposals:
        """Generate proposals from the guided anchors (ga_rpn test path)."""
        c = self.cfg
        b = images.shape[0]
        outs = self.head(self.extract(images))
        points, strides, _ = self._meta(images)
        loc = jnp.concatenate(
            [jax.nn.sigmoid(o[0].astype(jnp.float32)).reshape(b, -1) for o in outs],
            axis=1,
        )
        shape_pred = jnp.concatenate(
            [o[1].astype(jnp.float32).reshape(b, -1, 2) for o in outs], axis=1
        )
        cls = jnp.concatenate(
            [jax.nn.sigmoid(o[2].astype(jnp.float32)).reshape(b, -1) for o in outs],
            axis=1,
        )
        reg = jnp.concatenate(
            [o[3].astype(jnp.float32).reshape(b, -1, 4) for o in outs], axis=1
        )
        scores = cls * (loc > c.loc_filter_thr)
        anchors = jax.vmap(
            lambda sp: _generated_anchors(sp, points, strides, c.octave_base)
        )(shape_pred)
        k = min(cfg.nms_pre, scores.shape[1])
        top, idx = jax.lax.top_k(scores, k)
        sel_anchors = jnp.take_along_axis(anchors, idx[..., None], axis=1)
        sel_reg = jnp.take_along_axis(reg, idx[..., None], axis=1)
        boxes = jax.vmap(
            lambda a, d, sh: delta2bbox(a, d, max_shape=(sh[0], sh[1]))
        )(sel_anchors, sel_reg, img_shapes)
        nb, ns, nv = batched_nms_topk(
            boxes, top, jnp.ones(top.shape, bool), cfg.nms_thr, cfg.max_num
        )
        return Proposals(boxes=nb, scores=ns, valid=nv)

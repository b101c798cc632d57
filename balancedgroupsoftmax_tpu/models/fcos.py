"""FCOS — anchor-free single-stage detector head.

Parity: /root/reference/mmdet/models/anchor_heads/fcos_head.py — shared
4-conv towers, per-level learned scales on the ltrb regression (exp), a
centerness branch, point-in-box target assignment with per-level regression
ranges, focal cls loss + IoU regression loss + centerness BCE, and
`distance2bbox` decoding (core/bbox/transforms.py:202).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import batched_multiclass_nms
from ..ops.boxes import bbox_overlaps
from ..ops.losses import binary_cross_entropy_with_logits, sigmoid_focal_loss
from .detector import Detections
from .fpn import FPN
from .resnet import ResNet

INF = 1e8


@dataclasses.dataclass(frozen=True)
class FCOSConfig:
    num_classes: int = 1231  # incl. bg label 0; head outputs num_classes-1
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF)
    )
    stacked_convs: int = 4
    feat_channels: int = 256
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 300
    image_size: Tuple[int, int] = (800, 1344)


class FCOSHead(nn.Module):
    cfg: FCOSConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        c = self.cfg
        num_fg = c.num_classes - 1
        cls_convs = [
            nn.Conv(c.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
                    name=f"cls_conv{i}")
            for i in range(c.stacked_convs)
        ]
        reg_convs = [
            nn.Conv(c.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
                    name=f"reg_conv{i}")
            for i in range(c.stacked_convs)
        ]
        cls_out = nn.Conv(num_fg, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name="fcos_cls")
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name="fcos_reg")
        ctr_out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name="fcos_centerness")
        outs = []
        for lvl, x in enumerate(feats):
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            scale = self.param(f"scale{lvl}", nn.initializers.ones, ())
            ltrb = jnp.exp(reg_out(rf).astype(jnp.float32) * scale)
            outs.append((cls_out(cf), ltrb, ctr_out(cf)))
        return outs


def _points(h, w, stride):
    ys = (np.arange(h) * stride + stride // 2).astype(np.float32)
    xs = (np.arange(w) * stride + stride // 2).astype(np.float32)
    return np.stack(
        [np.tile(xs, h), np.repeat(ys, w)], axis=-1
    )  # (h*w, 2) x,y


class FCOS(nn.Module):
    cfg: FCOSConfig
    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, dtype=self.dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5, dtype=self.dtype, name="neck")
        self.head = FCOSHead(self.cfg, dtype=self.dtype, name="bbox_head")

    def extract(self, images):
        c2, c3, c4, c5 = self.backbone(images)
        return self.neck((c3, c4, c5))[:5]

    def __call__(self, images):
        return self.head(self.extract(images))

    def _level_points(self, images):
        c = self.cfg
        # grid sizes from the ACTUAL padded batch (portrait buckets would
        # otherwise get a transposed point grid; see detector._anchors)
        h, w = images.shape[1], images.shape[2]
        pts, ranges, strides = [], [], []
        for s, rr in zip(c.strides, c.regress_ranges):
            lh, lw = -(-h // s), -(-w // s)
            p = _points(lh, lw, s)
            pts.append(p)
            ranges.append(np.tile(np.asarray(rr, np.float32), (len(p), 1)))
            strides.append(np.full(len(p), s, np.float32))
        return (
            jnp.asarray(np.concatenate(pts)),
            jnp.asarray(np.concatenate(ranges)),
            jnp.asarray(np.concatenate(strides)),
        )

    def loss(self, images, gt_boxes, gt_labels, gt_mask, img_shapes) -> Dict:
        c = self.cfg
        num_fg = c.num_classes - 1
        outs = self.head(self.extract(images))
        points, ranges, _ = self._level_points(images)  # (P, 2), (P, 2)

        def one_image(gb, gl, gm):
            # ltrb of every point to every gt (P, G, 4)
            xs = points[:, 0][:, None]
            ys = points[:, 1][:, None]
            l = xs - gb[None, :, 0]
            t = ys - gb[None, :, 1]
            r = gb[None, :, 2] - xs
            b = gb[None, :, 3] - ys
            ltrb = jnp.stack([l, t, r, b], axis=-1)
            inside = ltrb.min(axis=-1) > 0
            maxd = ltrb.max(axis=-1)
            in_range = (maxd >= ranges[:, 0:1]) & (maxd <= ranges[:, 1:2])
            areas = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
            areas = jnp.where(gm[None, :] & inside & in_range, areas[None, :], INF)
            min_area = areas.min(axis=1)
            min_idx = areas.argmin(axis=1)
            pos = min_area < INF
            labels = jnp.where(pos, gl[min_idx], 0)
            tgt = jnp.take_along_axis(ltrb, min_idx[:, None, None], axis=1)[:, 0]
            # centerness target
            lr = tgt[:, [0, 2]]
            tb = tgt[:, [1, 3]]
            ctr = jnp.sqrt(
                (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6))
                * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6))
            )
            return labels, pos, tgt, jnp.where(pos, ctr, 0.0)

        labels, pos, tgt, ctr_t = jax.vmap(one_image)(gt_boxes, gt_labels, gt_mask)

        b = images.shape[0]
        cls_logits = jnp.concatenate(
            [o[0].astype(jnp.float32).reshape(b, -1, num_fg) for o in outs], axis=1
        )
        ltrb_pred = jnp.concatenate(
            [o[1].reshape(b, -1, 4) for o in outs], axis=1
        )
        ctr_logits = jnp.concatenate(
            [o[2].astype(jnp.float32).reshape(b, -1) for o in outs], axis=1
        )

        num_pos = jnp.maximum(jnp.sum(pos), 1.0)
        onehot = jax.nn.one_hot(labels - 1, num_fg) * pos[..., None]
        loss_cls = sigmoid_focal_loss(
            cls_logits, onehot, avg_factor=num_pos
        )
        # IoU loss on decoded boxes at positive points
        px = points[None, :, 0]
        py = points[None, :, 1]
        pred_boxes = jnp.stack(
            [px - ltrb_pred[..., 0], py - ltrb_pred[..., 1],
             px + ltrb_pred[..., 2], py + ltrb_pred[..., 3]], axis=-1,
        )
        tgt_boxes = jnp.stack(
            [px - tgt[..., 0], py - tgt[..., 1], px + tgt[..., 2], py + tgt[..., 3]],
            axis=-1,
        )
        ious = bbox_overlaps(pred_boxes, tgt_boxes, is_aligned=True)
        w = pos.astype(jnp.float32) * ctr_t
        loss_bbox = jnp.sum(-jnp.log(jnp.clip(ious, 1e-6, None)) * w) / jnp.maximum(
            jnp.sum(w), 1e-6
        )
        loss_ctr = binary_cross_entropy_with_logits(
            ctr_logits, ctr_t, weight=pos.astype(jnp.float32), avg_factor=num_pos
        )
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_centerness": loss_ctr}

    def predict(self, images, img_shapes, scale_factors, rescale: bool = True):
        c = self.cfg
        num_fg = c.num_classes - 1
        outs = self.head(self.extract(images))
        points, _, _ = self._level_points(images)
        b = images.shape[0]

        offset = 0
        boxes_all, scores_all = [], []
        for (cls_map, ltrb, ctr_map), s in zip(outs, c.strides):
            n = cls_map.shape[1] * cls_map.shape[2]
            p = points[offset : offset + n]
            offset += n
            scores = jax.nn.sigmoid(
                cls_map.astype(jnp.float32).reshape(b, n, num_fg)
            ) * jax.nn.sigmoid(ctr_map.astype(jnp.float32).reshape(b, n, 1))
            d = ltrb.reshape(b, n, 4)
            k = min(c.nms_pre, n)
            best = scores.max(axis=-1)
            _, idx = jax.lax.top_k(best, k)
            d = jnp.take_along_axis(d, idx[..., None], axis=1)
            sc = jnp.take_along_axis(scores, idx[..., None], axis=1)
            pp = p[idx]
            bx = jnp.stack(
                [pp[..., 0] - d[..., 0], pp[..., 1] - d[..., 1],
                 pp[..., 0] + d[..., 2], pp[..., 1] + d[..., 3]], axis=-1,
            )
            h_s = img_shapes[:, 0][:, None]
            w_s = img_shapes[:, 1][:, None]
            bx = jnp.stack(
                [jnp.clip(bx[..., 0], 0, w_s - 1), jnp.clip(bx[..., 1], 0, h_s - 1),
                 jnp.clip(bx[..., 2], 0, w_s - 1), jnp.clip(bx[..., 3], 0, h_s - 1)],
                axis=-1,
            )
            boxes_all.append(bx)
            scores_all.append(sc)

        boxes = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if rescale:
            boxes = boxes / scale_factors[:, None, None]
        scores = jnp.concatenate(
            [jnp.zeros((*scores.shape[:2], 1)), scores], axis=-1
        )
        db, ds, dl, dv = batched_multiclass_nms(
            boxes, scores, jnp.ones(boxes.shape[:2], bool),
            c.score_thr, c.nms_iou_thr, c.max_per_img,
        )
        return Detections(boxes=db, scores=ds, labels=dl, valid=dv)

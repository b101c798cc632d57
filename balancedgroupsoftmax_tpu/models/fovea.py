"""FoveaBox — anchor-free detector head (fovea-region assignment).

Parity: /root/reference/mmdet/models/anchor_heads/fovea_head.py — per-level
cls + box towers; positives are points inside the *fovea* (the GT box
shrunk by sigma around its center) on the level whose base scale matches
the GT area; regression targets are log-normalized corner distances
(fovea_head.py get_targets); focal cls loss + smooth-L1 box loss;
decode inverts the log mapping around the point.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import batched_multiclass_nms
from ..ops.losses import sigmoid_focal_loss, smooth_l1
from .detector import Detections
from .fcos import _points
from .fpn import FPN
from .resnet import ResNet


@dataclasses.dataclass(frozen=True)
class FoveaConfig:
    num_classes: int = 1231
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    base_edges: Tuple[int, ...] = (16, 32, 64, 128, 256)
    scale_ranges: Tuple[Tuple[float, float], ...] = (
        (1, 64), (32, 128), (64, 256), (128, 512), (256, 2048)
    )
    sigma: float = 0.4
    stacked_convs: int = 4
    feat_channels: int = 256
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 300
    image_size: Tuple[int, int] = (800, 1344)


class FoveaHead(nn.Module):
    cfg: FoveaConfig
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
                          dtype=self.dtype, name="fovea_cls")
        reg_out = nn.Conv(4, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name="fovea_reg")
        outs = []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            outs.append((cls_out(cf), reg_out(rf)))
        return outs


class FoveaBox(nn.Module):
    cfg: FoveaConfig
    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, dtype=self.dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5, dtype=self.dtype, name="neck")
        self.head = FoveaHead(self.cfg, dtype=self.dtype, name="bbox_head")

    def extract(self, images):
        c2, c3, c4, c5 = self.backbone(images)
        return self.neck((c3, c4, c5))[:5]

    def __call__(self, images):
        return self.head(self.extract(images))

    def _level_meta(self, images):
        c = self.cfg
        # grid sizes from the ACTUAL padded batch (portrait buckets would
        # otherwise get a transposed point grid; see detector._anchors)
        h, w = images.shape[1], images.shape[2]
        pts, bases, ranges = [], [], []
        for s, be, rr in zip(c.strides, c.base_edges, c.scale_ranges):
            lh, lw = -(-h // s), -(-w // s)
            p = _points(lh, lw, s)
            pts.append(p)
            bases.append(np.full(len(p), be, np.float32))
            ranges.append(np.tile(np.asarray(rr, np.float32), (len(p), 1)))
        return (
            jnp.asarray(np.concatenate(pts)),
            jnp.asarray(np.concatenate(bases)),
            jnp.asarray(np.concatenate(ranges)),
        )

    def loss(self, images, gt_boxes, gt_labels, gt_mask, img_shapes) -> Dict:
        c = self.cfg
        num_fg = c.num_classes - 1
        outs = self.head(self.extract(images))
        points, bases, ranges = self._level_meta(images)

        def one_image(gb, gl, gm):
            xs = points[:, 0][:, None]
            ys = points[:, 1][:, None]
            cx = (gb[None, :, 0] + gb[None, :, 2]) / 2
            cy = (gb[None, :, 1] + gb[None, :, 3]) / 2
            gw = gb[None, :, 2] - gb[None, :, 0] + 1
            gh = gb[None, :, 3] - gb[None, :, 1] + 1
            # fovea: point within sigma-shrunk box
            in_fovea = (
                (xs > cx - c.sigma * gw / 2)
                & (xs < cx + c.sigma * gw / 2)
                & (ys > cy - c.sigma * gh / 2)
                & (ys < cy + c.sigma * gh / 2)
            )
            scale = jnp.sqrt(gw * gh)  # (1, G)
            in_range = (scale >= ranges[:, 0:1]) & (scale <= ranges[:, 1:2])
            areas = jnp.where(gm[None, :] & in_fovea & in_range, gw * gh, 1e9)
            min_area = areas.min(axis=1)
            idx = areas.argmin(axis=1)
            pos = min_area < 1e9
            labels = jnp.where(pos, gl[idx], 0)
            g = gb[idx]
            base = bases[:, None]
            t = jnp.stack(
                [
                    (xs[:, 0] - g[:, 0]) / base[:, 0],
                    (ys[:, 0] - g[:, 1]) / base[:, 0],
                    (g[:, 2] - xs[:, 0]) / base[:, 0],
                    (g[:, 3] - ys[:, 0]) / base[:, 0],
                ],
                axis=-1,
            )
            t = jnp.log(jnp.clip(t, 1.0 / 16, 16.0))
            return labels, pos, t

        labels, pos, tgt = jax.vmap(one_image)(gt_boxes, gt_labels, gt_mask)

        b = images.shape[0]
        cls_logits = jnp.concatenate(
            [o[0].astype(jnp.float32).reshape(b, -1, num_fg) for o in outs], axis=1
        )
        reg = jnp.concatenate(
            [o[1].astype(jnp.float32).reshape(b, -1, 4) for o in outs], axis=1
        )
        num_pos = jnp.maximum(jnp.sum(pos), 1.0)
        onehot = jax.nn.one_hot(labels - 1, num_fg) * pos[..., None]
        loss_cls = sigmoid_focal_loss(cls_logits, onehot, avg_factor=num_pos)
        loss_bbox = smooth_l1(
            reg, tgt, beta=0.11, weight=pos[..., None].astype(jnp.float32),
            avg_factor=num_pos,
        )
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}

    def predict(self, images, img_shapes, scale_factors, rescale: bool = True):
        c = self.cfg
        num_fg = c.num_classes - 1
        outs = self.head(self.extract(images))
        points, bases, _ = self._level_meta(images)
        b = images.shape[0]
        offset = 0
        boxes_all, scores_all = [], []
        for (cls_map, reg_map), be in zip(outs, c.base_edges):
            n = cls_map.shape[1] * cls_map.shape[2]
            p = points[offset : offset + n]
            offset += n
            scores = jax.nn.sigmoid(cls_map.astype(jnp.float32).reshape(b, n, num_fg))
            t = jnp.exp(reg_map.astype(jnp.float32).reshape(b, n, 4)) * be
            k = min(c.nms_pre, n)
            best = scores.max(axis=-1)
            _, idx = jax.lax.top_k(best, k)
            t = jnp.take_along_axis(t, idx[..., None], axis=1)
            sc = jnp.take_along_axis(scores, idx[..., None], axis=1)
            pp = p[idx]
            bx = jnp.stack(
                [pp[..., 0] - t[..., 0], pp[..., 1] - t[..., 1],
                 pp[..., 0] + t[..., 2], pp[..., 1] + t[..., 3]], axis=-1,
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

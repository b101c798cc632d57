"""SSD-VGG backbone + SSD head (single-shot detector family).

Parity: /root/reference/mmdet/models/backbones/ssd_vgg.py (VGG16 with
dilated fc6/fc7 convs, L2Norm on conv4_3, extra stride-2 feature layers)
and anchor_heads/ssd_head.py (per-level MultiBox conv heads, softmax CE
with 3:1 online hard-negative mining, smooth-L1 regression). The reference
ships SSD for its WIDER-FACE demo (SURVEY.md §2.3 baggage); provided here
for family completeness at SSD300 geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.anchors import grid_anchors
from ..core.assigner import assign_max_iou
from ..kernels import batched_multiclass_nms
from ..ops.boxes import bbox2delta, delta2bbox
from ..ops.losses import smooth_l1
from .detector import Detections

VGG_CFG = (2, 2, 3, 3, 3)  # convs per block
VGG_CH = (64, 128, 256, 512, 512)


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    num_classes: int = 21  # VOC-style default (incl. bg label 0)
    input_size: int = 300
    strides: Tuple[int, ...] = (8, 16, 32, 64, 100, 300)
    base_sizes: Tuple[int, ...] = (21, 45, 99, 153, 207, 261)
    max_sizes: Tuple[int, ...] = (45, 99, 153, 207, 261, 315)
    ratios: Tuple[Tuple[float, ...], ...] = (
        (2,), (2, 3), (2, 3), (2, 3), (2,), (2,)
    )
    neg_pos_ratio: float = 3.0
    score_thr: float = 0.02
    nms_iou_thr: float = 0.45
    max_per_img: int = 200


class L2Norm(nn.Module):
    scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        g = self.param(
            "scale", nn.initializers.constant(self.scale), (x.shape[-1],)
        )
        n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)
        return x / n * g


class SSDVGG(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        outs = []
        for b, (n, ch) in enumerate(zip(VGG_CFG, VGG_CH)):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                            name=f"conv{b + 1}_{i + 1}")(x)
                x = nn.relu(x)
            if b == 3:
                outs.append(L2Norm(name="l2norm")(x))  # conv4_3
            if b < 4:
                # ceil_mode pooling (SSD VGG: 75 -> 38 at pool3)
                ph = x.shape[1] % 2
                pw = x.shape[2] % 2
                x = nn.max_pool(
                    x, (2, 2), strides=(2, 2), padding=[(0, ph), (0, pw)]
                )
            else:  # pool5: 3x3 stride 1
                x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
        # fc6 (dilated) + fc7
        x = nn.Conv(1024, (3, 3), padding=[(6, 6)] * 2, kernel_dilation=(6, 6),
                    dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        x = nn.Conv(1024, (1, 1), dtype=self.dtype, name="fc7")(x)
        x = nn.relu(x)
        outs.append(x)
        # extra layers: conv8-conv11
        chans = [(256, 512, 2), (128, 256, 2), (128, 256, 1), (128, 256, 1)]
        for i, (c1, c2, stride) in enumerate(chans):
            x = nn.relu(nn.Conv(c1, (1, 1), dtype=self.dtype, name=f"extra{i}_1")(x))
            pad = 1 if stride == 2 else 0
            x = nn.relu(
                nn.Conv(c2, (3, 3), strides=(stride, stride),
                        padding=[(pad, pad)] * 2, dtype=self.dtype,
                        name=f"extra{i}_2")(x)
            )
            outs.append(x)
        return outs


def ssd_anchors(cfg: SSDConfig, featmap_sizes):
    """SSD anchor geometry: per level 1 + 1 + 2*len(ratios) boxes."""
    all_anchors = []
    for (h, w), stride, base, maxs, ratios in zip(
        featmap_sizes, cfg.strides, cfg.base_sizes, cfg.max_sizes, cfg.ratios
    ):
        scales = [1.0, float(np.sqrt(maxs / base))]
        ars = [1.0]
        for r in ratios:
            ars += [float(r), 1.0 / r]
        # mmdet SSDHead: anchors = scale1*ratio1, scale2*ratio1, then
        # scale1 * other ratios
        anchor_params = [(scales[0], 1.0), (scales[1], 1.0)] + [
            (scales[0], a) for a in ars[1:]
        ]
        anchors = []
        ctr = (stride - 1) / 2.0
        ys = np.arange(h) * stride + ctr
        xs = np.arange(w) * stride + ctr
        for s, a in anchor_params:
            bw = base * s * np.sqrt(a)
            bh = base * s / np.sqrt(a)
            grid_x = np.tile(xs, h)
            grid_y = np.repeat(ys, w)
            anchors.append(
                np.stack(
                    [grid_x - (bw - 1) / 2, grid_y - (bh - 1) / 2,
                     grid_x + (bw - 1) / 2, grid_y + (bh - 1) / 2], axis=-1,
                )
            )
        # interleave per location: (num_anchors, HW, 4) -> (HW, A, 4)
        lvl = np.stack(anchors, axis=1).reshape(-1, 4).astype(np.float32)
        all_anchors.append(lvl)
    return all_anchors


class SSDHead(nn.Module):
    cfg: SSDConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        c = self.cfg
        outs = []
        for i, x in enumerate(feats):
            a = 2 + 2 * len(c.ratios[i])
            cls = nn.Conv(a * c.num_classes, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype, name=f"cls{i}")(x)
            reg = nn.Conv(a * 4, (3, 3), padding=[(1, 1)] * 2,
                          dtype=self.dtype, name=f"reg{i}")(x)
            outs.append((cls, reg))
        return outs


class SSD(nn.Module):
    cfg: SSDConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = SSDVGG(dtype=self.dtype, name="backbone")
        self.head = SSDHead(self.cfg, dtype=self.dtype, name="bbox_head")

    def __call__(self, images):
        return self.head(self.backbone(images))

    def _anchors(self, featmap_sizes):
        return [jnp.asarray(a) for a in ssd_anchors(self.cfg, featmap_sizes)]

    def loss(self, images, gt_boxes, gt_labels, gt_mask) -> Dict:
        c = self.cfg
        b = images.shape[0]
        outs = self.head(self.backbone(images))
        sizes = [(o[0].shape[1], o[0].shape[2]) for o in outs]
        anchors = jnp.concatenate(self._anchors(sizes), axis=0)

        def one_image(gb, gl, gm):
            assign = assign_max_iou(
                anchors, jnp.ones(anchors.shape[0], bool), gb, gl, gm,
                pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0,
            )
            pos = assign.gt_inds > 0
            labels = jnp.where(pos, assign.labels, 0)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gb.shape[0] - 1)
            deltas = bbox2delta(
                anchors, gb[gt_idx], stds=(0.1, 0.1, 0.2, 0.2)
            )
            return labels, pos, deltas

        labels, pos, deltas_t = jax.vmap(one_image)(gt_boxes, gt_labels, gt_mask)
        cls_logits = jnp.concatenate(
            [o[0].astype(jnp.float32).reshape(b, -1, c.num_classes) for o in outs],
            axis=1,
        )
        reg = jnp.concatenate(
            [o[1].astype(jnp.float32).reshape(b, -1, 4) for o in outs], axis=1
        )
        # per-anchor CE; hard negative mining 3:1 (ssd_head.py loss_single)
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        num_pos = jnp.sum(pos, axis=1)  # per image
        k_neg = jnp.clip((num_pos * c.neg_pos_ratio).astype(jnp.int32), 1, ce.shape[1])
        neg_ce = jnp.where(pos, -jnp.inf, ce)
        sorted_neg = -jnp.sort(-neg_ce, axis=1)  # descending
        rank = jnp.arange(ce.shape[1])[None, :]
        thresh = jnp.take_along_axis(sorted_neg, (k_neg - 1)[:, None], axis=1)
        hard_neg = (~pos) & (ce >= thresh) & jnp.isfinite(neg_ce)
        weight = (pos | hard_neg).astype(jnp.float32)
        total_pos = jnp.maximum(jnp.sum(num_pos), 1.0)
        loss_cls = jnp.sum(ce * weight) / total_pos
        loss_bbox = smooth_l1(
            reg, deltas_t, beta=1.0, weight=pos[..., None].astype(jnp.float32),
            avg_factor=total_pos,
        )
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}

    def predict(self, images, img_shapes, scale_factors, rescale: bool = True):
        c = self.cfg
        b = images.shape[0]
        outs = self.head(self.backbone(images))
        sizes = [(o[0].shape[1], o[0].shape[2]) for o in outs]
        anchors = jnp.concatenate(self._anchors(sizes), axis=0)
        cls_logits = jnp.concatenate(
            [o[0].astype(jnp.float32).reshape(b, -1, c.num_classes) for o in outs],
            axis=1,
        )
        reg = jnp.concatenate(
            [o[1].astype(jnp.float32).reshape(b, -1, 4) for o in outs], axis=1
        )
        scores = jax.nn.softmax(cls_logits, axis=-1)
        boxes = jax.vmap(
            lambda d: delta2bbox(
                anchors, d, stds=(0.1, 0.1, 0.2, 0.2),
                max_shape=(c.input_size, c.input_size),
            )
        )(reg)
        if rescale:
            boxes = boxes / scale_factors[:, None, None]
        db, ds, dl, dv = batched_multiclass_nms(
            boxes, scores, jnp.ones(boxes.shape[:2], bool),
            c.score_thr, c.nms_iou_thr, c.max_per_img,
        )
        return Detections(boxes=db, scores=ds, labels=dl, valid=dv)

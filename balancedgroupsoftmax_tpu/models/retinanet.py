"""RetinaNet — single-stage detector (anchor-head family coverage).

Parity: /root/reference/mmdet/models/anchor_heads/retina_head.py (4-conv
cls/reg towers, 9 anchors/cell: 3 octave scales x 3 ratios, focal loss)
and detectors/single_stage.py + retinanet.py. The reference ships these
heads as unused-by-LVIS baggage (SURVEY.md §2.3); here they complete the
anchor-head family with the same TPU-native machinery: static anchors,
masked focal loss over all anchors (PseudoSampler semantics,
anchor_target with sampling=False), fixed-capacity per-level top-k +
batched NMS at test time.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import AssignerConfig
from ..core.anchors import multilevel_anchors
from ..core.assigner import assign_max_iou
from ..kernels import batched_multiclass_nms
from ..ops.boxes import bbox2delta, delta2bbox
from ..ops.losses import sigmoid_focal_loss, smooth_l1
from .detector import Detections
from .fpn import FPN
from .resnet import ResNet


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    num_classes: int = 1231  # incl. background label 0 (sigmoid: C-1 outputs)
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: float = 4.0
    scales_per_octave: int = 3
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    stacked_convs: int = 4
    feat_channels: int = 256
    assigner: AssignerConfig = AssignerConfig(
        pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0
    )
    target_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 300
    image_size: Tuple[int, int] = (800, 1344)

    @property
    def anchor_scales(self) -> Tuple[float, ...]:
        return tuple(
            self.octave_base_scale * 2 ** (i / self.scales_per_octave)
            for i in range(self.scales_per_octave)
        )

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.ratios)


class RetinaHead(nn.Module):
    cfg: RetinaNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        c = self.cfg
        num_fg = c.num_classes - 1
        cls_convs = [
            nn.Conv(c.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name=f"cls_conv{i}")
            for i in range(c.stacked_convs)
        ]
        reg_convs = [
            nn.Conv(c.feat_channels, (3, 3), padding=[(1, 1)] * 2,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name=f"reg_conv{i}")
            for i in range(c.stacked_convs)
        ]
        # focal-loss bias prior pi=0.01 (retina_head.py init: bias_cls)
        bias_init = nn.initializers.constant(-4.595)
        cls_out = nn.Conv(c.num_anchors * num_fg, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=bias_init, dtype=self.dtype, name="retina_cls")
        reg_out = nn.Conv(c.num_anchors * 4, (3, 3), padding=[(1, 1)] * 2,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name="retina_reg")
        outs = []
        for x in feats:
            cf, rf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in reg_convs:
                rf = nn.relu(conv(rf))
            outs.append((cls_out(cf), reg_out(rf)))
        return outs


class RetinaNet(nn.Module):
    cfg: RetinaNetConfig
    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, dtype=self.dtype, name="backbone")
        # RetinaNet FPN: P3-P7 (start level 1, extra conv levels); our FPN
        # emits 5 levels from C2-C5 — use C3-C5 + 2 maxpool extras
        self.neck = FPN(out_channels=256, num_outs=5, dtype=self.dtype, name="neck")
        self.head = RetinaHead(self.cfg, dtype=self.dtype, name="bbox_head")

    def extract(self, images):
        c2, c3, c4, c5 = self.backbone(images)
        return self.neck((c3, c4, c5))[:5]

    def __call__(self, images):
        return self.head(self.extract(images))

    def _anchors(self, images):
        # grid sizes from the actual padded batch shape (see detector.py
        # _anchors — a fixed cfg.image_size transposes portrait buckets)
        c = self.cfg
        h, w = images.shape[1], images.shape[2]
        sizes = [(-(-h // s), -(-w // s)) for s in c.strides]
        return [
            jnp.asarray(a)
            for a in multilevel_anchors(
                sizes, c.strides, c.anchor_scales, c.ratios,
                base_sizes=c.strides,
            )
        ]

    def loss(self, images, gt_boxes, gt_labels, gt_mask, img_shapes) -> Dict:
        c = self.cfg
        b = images.shape[0]
        num_fg = c.num_classes - 1
        outs = self.head(self.extract(images))
        anchors = jnp.concatenate(self._anchors(images), axis=0)  # (N, 4)

        def one_image(gb, gl, gm, shape):
            inside = (
                (anchors[:, 0] >= 0)
                & (anchors[:, 1] >= 0)
                & (anchors[:, 2] < shape[1])
                & (anchors[:, 3] < shape[0])
            )
            assign = assign_max_iou(
                anchors, inside, gb, gl, gm,
                pos_iou_thr=c.assigner.pos_iou_thr,
                neg_iou_thr=c.assigner.neg_iou_thr,
                min_pos_iou=c.assigner.min_pos_iou,
            )
            pos = assign.gt_inds > 0
            neg = assign.gt_inds == 0
            labels = jnp.where(pos, assign.labels, 0)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gb.shape[0] - 1)
            deltas = bbox2delta(anchors, gb[gt_idx], c.target_means, c.target_stds)
            return labels, pos, neg, deltas

        labels, pos, neg, deltas_t = jax.vmap(one_image)(
            gt_boxes, gt_labels, gt_mask, img_shapes
        )

        cls_logits = jnp.concatenate(
            [o[0].astype(jnp.float32).reshape(b, -1, num_fg) for o in outs], axis=1
        )
        reg = jnp.concatenate(
            [o[1].astype(jnp.float32).reshape(b, -1, 4) for o in outs], axis=1
        )
        onehot = jax.nn.one_hot(labels - 1, num_fg, dtype=jnp.float32) * pos[..., None]
        num_pos = jnp.maximum(jnp.sum(pos), 1.0)
        loss_cls = sigmoid_focal_loss(
            cls_logits, onehot,
            weight=(pos | neg)[..., None].astype(jnp.float32),
            gamma=c.focal_gamma, alpha=c.focal_alpha, avg_factor=num_pos,
        )
        loss_bbox = smooth_l1(
            reg, deltas_t, beta=0.11,
            weight=pos[..., None].astype(jnp.float32), avg_factor=num_pos,
        )
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}

    def predict(self, images, img_shapes, scale_factors, rescale: bool = True):
        c = self.cfg
        b = images.shape[0]
        num_fg = c.num_classes - 1
        outs = self.head(self.extract(images))
        anchors = self._anchors(images)

        def one_image(level_outs, shape, sf):
            boxes_all, scores_all = [], []
            for (cls_map, reg_map), anc in zip(level_outs, anchors):
                scores = jax.nn.sigmoid(
                    cls_map.astype(jnp.float32).reshape(-1, num_fg)
                )
                deltas = reg_map.astype(jnp.float32).reshape(-1, 4)
                k = min(c.nms_pre, scores.shape[0])
                best = scores.max(axis=1)
                _, idx = jax.lax.top_k(best, k)
                boxes = delta2bbox(
                    anc[idx], deltas[idx], c.target_means, c.target_stds,
                    max_shape=(shape[0], shape[1]),
                )
                boxes_all.append(boxes)
                scores_all.append(scores[idx])
            boxes = jnp.concatenate(boxes_all)
            scores = jnp.concatenate(scores_all)
            if rescale:
                boxes = boxes / sf
            # prepend a dummy background column for multiclass_nms layout
            scores = jnp.concatenate(
                [jnp.zeros((scores.shape[0], 1)), scores], axis=1
            )
            return boxes, scores

        boxes, scores = jax.vmap(one_image)(outs, img_shapes, scale_factors)
        db, ds, dl, dv = batched_multiclass_nms(
            boxes, scores, jnp.ones(boxes.shape[:2], bool),
            c.score_thr, c.nms_iou_thr, c.max_per_img,
        )
        return Detections(boxes=db, scores=ds, labels=dl, valid=dv)

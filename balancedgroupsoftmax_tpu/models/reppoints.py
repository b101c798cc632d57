"""RepPoints — point-set representation detector head.

Parity: /root/reference/mmdet/models/anchor_heads/reppoints_head.py and
core/anchor/point_target.py — each location predicts 9 representative
points (init stage), the classification and refinement branches consume
features through deformable convs driven by those points, refined points
convert to boxes via the min-max transform, and losses supervise both
stages (point assigner for init: each GT claims the nearest point on its
scale-matched level; max-IoU on init boxes for refine).

Built on ops/deform_conv.deform_conv2d; the reference's CUDA DCN becomes
the same gather+matmul form.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.assigner import assign_max_iou
from ..kernels import batched_multiclass_nms
from ..ops.deform_conv import deform_conv2d
from ..ops.losses import sigmoid_focal_loss, smooth_l1
from .detector import Detections
from .fcos import _points
from .fpn import FPN
from .resnet import ResNet

NUM_POINTS = 9


@dataclasses.dataclass(frozen=True)
class RepPointsConfig:
    num_classes: int = 1231
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4  # init box half-extent in strides
    stacked_convs: int = 3
    feat_channels: int = 256
    gradient_mul: float = 0.1
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 300
    image_size: Tuple[int, int] = (800, 1344)


# dcn base offsets for a 3x3 kernel, row-major (dy, dx), matching
# reppoints_head.py dcn_base_offset
_DCN_BASE = np.stack(
    [np.repeat(np.arange(-1, 2), 3), np.tile(np.arange(-1, 2), 3)], axis=-1
).reshape(-1).astype(np.float32)  # (18,) interleaved (dy, dx) per tap


class RepPointsHead(nn.Module):
    cfg: RepPointsConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        c = self.cfg
        num_fg = c.num_classes - 1
        ch = c.feat_channels
        cls_convs = [
            nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                    kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
                    name=f"cls_conv{i}")
            for i in range(c.stacked_convs)
        ]
        pts_convs = [
            nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                    kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
                    name=f"pts_conv{i}")
            for i in range(c.stacked_convs)
        ]
        init_conv = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                            kernel_init=nn.initializers.normal(0.01),
                            dtype=self.dtype, name="pts_init_conv")
        init_out = nn.Conv(2 * NUM_POINTS, (1, 1),
                           kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name="pts_init_out")
        cls_dcn_w = self.param(
            "cls_dcn_kernel", nn.initializers.normal(0.01), (3, 3, ch, ch)
        )
        cls_out = nn.Conv(num_fg, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(-4.595),
                          dtype=self.dtype, name="cls_out")
        refine_dcn_w = self.param(
            "refine_dcn_kernel", nn.initializers.normal(0.01), (3, 3, ch, ch)
        )
        refine_out = nn.Conv(2 * NUM_POINTS, (1, 1),
                             kernel_init=nn.initializers.zeros,
                             dtype=self.dtype, name="pts_refine_out")

        base = jnp.asarray(_DCN_BASE)
        outs = []
        for x in feats:
            cf, pf = x, x
            for conv in cls_convs:
                cf = nn.relu(conv(cf))
            for conv in pts_convs:
                pf = nn.relu(conv(pf))
            pts_init = init_out(nn.relu(init_conv(pf))).astype(jnp.float32)
            # gradient_mul: mostly detach the init points for the dcn offsets
            g = c.gradient_mul
            pts_for_dcn = (
                jax.lax.stop_gradient(pts_init) * (1 - g) + pts_init * g
            )
            dcn_off = pts_for_dcn - base[None, None, None, :]
            cls_feat = jax.vmap(
                lambda xi, oi: deform_conv2d(xi, oi, cls_dcn_w)
            )(cf, dcn_off)
            cls_score = cls_out(nn.relu(cls_feat.astype(self.dtype)))
            ref_feat = jax.vmap(
                lambda xi, oi: deform_conv2d(xi, oi, refine_dcn_w)
            )(pf, dcn_off)
            pts_delta = refine_out(nn.relu(ref_feat.astype(self.dtype))).astype(
                jnp.float32
            )
            pts_refine = jax.lax.stop_gradient(pts_init) + pts_delta
            outs.append((cls_score, pts_init, pts_refine))
        return outs


def points_to_boxes(pts: jnp.ndarray, centers: jnp.ndarray, stride: float):
    """Min-max transform: (..., 18) offsets (dy,dx interleaved, in stride
    units) + point centers (..., 2) (x, y) -> (..., 4) xyxy boxes."""
    dy = pts[..., 0::2] * stride
    dx = pts[..., 1::2] * stride
    x = centers[..., 0:1] + dx
    y = centers[..., 1:2] + dy
    return jnp.stack(
        [x.min(-1), y.min(-1), x.max(-1), y.max(-1)], axis=-1
    )


class RepPoints(nn.Module):
    cfg: RepPointsConfig
    depth: int = 50
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.depth, dtype=self.dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5, dtype=self.dtype, name="neck")
        self.head = RepPointsHead(self.cfg, dtype=self.dtype, name="bbox_head")

    def extract(self, images):
        c2, c3, c4, c5 = self.backbone(images)
        return self.neck((c3, c4, c5))[:5]

    def __call__(self, images):
        return self.head(self.extract(images))

    def _meta(self, images):
        c = self.cfg
        # grid sizes from the ACTUAL padded batch (portrait buckets would
        # otherwise get a transposed point grid; see detector._anchors)
        h, w = images.shape[1], images.shape[2]
        pts, strides, lvl_ids = [], [], []
        for li, s in enumerate(c.strides):
            lh, lw = -(-h // s), -(-w // s)
            p = _points(lh, lw, s)
            pts.append(p)
            strides.append(np.full(len(p), s, np.float32))
            lvl_ids.append(np.full(len(p), li, np.int32))
        return (
            jnp.asarray(np.concatenate(pts)),
            jnp.asarray(np.concatenate(strides)),
            jnp.asarray(np.concatenate(lvl_ids)),
        )

    def loss(self, images, gt_boxes, gt_labels, gt_mask, img_shapes) -> Dict:
        c = self.cfg
        num_fg = c.num_classes - 1
        outs = self.head(self.extract(images))
        centers, strides, lvl_ids = self._meta(images)
        b = images.shape[0]

        cls_logits = jnp.concatenate(
            [o[0].astype(jnp.float32).reshape(b, -1, num_fg) for o in outs], axis=1
        )
        pts_init = jnp.concatenate(
            [o[1].reshape(b, -1, 2 * NUM_POINTS) for o in outs], axis=1
        )
        pts_refine = jnp.concatenate(
            [o[2].reshape(b, -1, 2 * NUM_POINTS) for o in outs], axis=1
        )
        boxes_init = points_to_boxes(pts_init, centers[None], strides[None, :, None])
        boxes_refine = points_to_boxes(pts_refine, centers[None], strides[None, :, None])

        num_levels = len(c.strides)

        def one_image(gb, gl, gm, b_init):
            # --- init stage: point assigner (point_target.py semantics):
            # each gt claims the nearest point on its scale-matched level
            gw = gb[:, 2] - gb[:, 0] + 1
            gh = gb[:, 3] - gb[:, 1] + 1
            scale = jnp.sqrt(gw * gh)
            gt_lvl = jnp.clip(
                jnp.floor(jnp.log2(scale / (c.point_base_scale * c.strides[0]) + 1e-6)),
                0, num_levels - 1,
            ).astype(jnp.int32)
            cx = (gb[:, 0] + gb[:, 2]) / 2
            cy = (gb[:, 1] + gb[:, 3]) / 2
            d2 = (centers[:, 0][:, None] - cx[None, :]) ** 2 + (
                centers[:, 1][:, None] - cy[None, :]
            ) ** 2
            same_lvl = lvl_ids[:, None] == gt_lvl[None, :]
            d2 = jnp.where(same_lvl & gm[None, :], d2, jnp.inf)
            best_pt = jnp.argmin(d2, axis=0)  # (G,) nearest point per gt
            # scatter with max so padded gts (gm False) never clobber and
            # duplicate claims resolve deterministically (highest gt index)
            init_pos = jnp.zeros(centers.shape[0], bool).at[best_pt].max(gm)
            init_gt = jnp.zeros(centers.shape[0], jnp.int32).at[best_pt].max(
                jnp.where(gm, jnp.arange(gb.shape[0], dtype=jnp.int32), 0)
            )
            init_tgt = gb[init_gt]

            # --- refine stage: max-IoU on the init boxes
            assign = assign_max_iou(
                b_init, jnp.ones(b_init.shape[0], bool), gb, gl, gm,
                pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
            )
            ref_pos = assign.gt_inds > 0
            labels = jnp.where(ref_pos, assign.labels, 0)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gb.shape[0] - 1)
            ref_tgt = gb[gt_idx]
            return init_pos, init_tgt, labels, ref_pos, ref_tgt

        init_pos, init_tgt, labels, ref_pos, ref_tgt = jax.vmap(one_image)(
            gt_boxes, gt_labels, gt_mask, boxes_init
        )

        num_init = jnp.maximum(jnp.sum(init_pos), 1.0)
        num_ref = jnp.maximum(jnp.sum(ref_pos), 1.0)
        norm = (c.point_base_scale * strides)[None, :, None]
        loss_init = smooth_l1(
            boxes_init / norm, init_tgt / norm, beta=0.11,
            weight=init_pos[..., None].astype(jnp.float32) * 0.5,
            avg_factor=num_init,
        )
        loss_refine = smooth_l1(
            boxes_refine / norm, ref_tgt / norm, beta=0.11,
            weight=ref_pos[..., None].astype(jnp.float32),
            avg_factor=num_ref,
        )
        onehot = jax.nn.one_hot(labels - 1, num_fg) * ref_pos[..., None]
        loss_cls = sigmoid_focal_loss(cls_logits, onehot, avg_factor=num_ref)
        return {
            "loss_cls": loss_cls,
            "loss_pts_init": loss_init,
            "loss_pts_refine": loss_refine,
        }

    def predict(self, images, img_shapes, scale_factors, rescale: bool = True):
        c = self.cfg
        num_fg = c.num_classes - 1
        outs = self.head(self.extract(images))
        centers, strides, _ = self._meta(images)
        b = images.shape[0]
        offset = 0
        boxes_all, scores_all = [], []
        for (cls_map, _, pts_ref), s in zip(outs, c.strides):
            n = cls_map.shape[1] * cls_map.shape[2]
            ctr = centers[offset : offset + n]
            offset += n
            scores = jax.nn.sigmoid(cls_map.astype(jnp.float32).reshape(b, n, num_fg))
            pts = pts_ref.reshape(b, n, 2 * NUM_POINTS)
            k = min(c.nms_pre, n)
            best = scores.max(axis=-1)
            _, idx = jax.lax.top_k(best, k)
            pts = jnp.take_along_axis(pts, idx[..., None], axis=1)
            sc = jnp.take_along_axis(scores, idx[..., None], axis=1)
            bx = points_to_boxes(pts, ctr[idx], float(s))
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

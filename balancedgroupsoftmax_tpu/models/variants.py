"""Detector-assembly variants on the shared two-stage machinery.

Parity targets (each a small wiring over heads that already exist here):
- FastRCNN    — /root/reference/mmdet/models/detectors/fast_rcnn.py:
                a TwoStageDetector with NO RPN; proposals are an input
                (the reference feeds them from dataset proposal files).
- GridRCNN    — grid_rcnn.py: bbox head classifies, the grid head
                (models/grid_head.py) re-localizes — training jitters the
                positive rois (grid_rcnn.py:58-81) and supervises gaussian
                point heatmaps; at test the detected boxes are replaced by
                grid-decoded boxes (grid_rcnn.py:200-229).
- MaskScoringRCNN — mask_scoring_rcnn.py: Mask R-CNN + MaskIoU head
                (models/extra_heads.py MaskIoUHead); training regresses
                the predicted-vs-gt mask IoU (L2 on positives), test
                multiplies the detection score by the predicted mask IoU
                (maskiou_head.py get_mask_scores).
- DoubleHeadRCNN — double_head_rcnn.py: the conv branch of the double
                head pools rois inflated by reg_roi_scale_factor, the fc
                branch pools the plain rois.

TPU-native notes: all variants keep the fixed-capacity vmapped tensor
flow of models/detector.py — the grid branch trains on the static
positive prefix under a validity mask instead of the reference's
randperm-192 dynamic subset (a speed hack there; here static shapes keep
the step jittable), and FastRCNN takes a static (B, P, 4) proposal
tensor + validity mask instead of per-image lists.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..kernels import batched_multilevel_roi_align
from .detector import Detections, FasterRCNN
from .extra_heads import MaskIoUHead, mask_iou_target
from .grid_head import GridHead, grid_targets, grid_to_boxes
from .mask_head import FCNMaskHead  # noqa: F401 (re-export convenience)


def _scale_rois(rois: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Inflate rois about their centers (roi_align.py roi_scale_factor)."""
    cx = (rois[..., 0] + rois[..., 2]) * 0.5
    cy = (rois[..., 1] + rois[..., 3]) * 0.5
    hw = (rois[..., 2] - rois[..., 0]) * 0.5 * factor
    hh = (rois[..., 3] - rois[..., 1]) * 0.5 * factor
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


class FastRCNN(FasterRCNN):
    """Precomputed-proposal detector (fast_rcnn.py): no RPN head exists in
    the param tree; loss/predict take a (B, P, 4) proposal tensor and a
    (B, P) validity mask."""

    HAS_RPN = False

    def __call__(self, images):
        """Init/trace convenience (no RPN to touch)."""
        feats = self.extract_feats(images)
        b = images.shape[0]
        s = self.cfg.roi_extractor.out_size
        dummy = jnp.zeros((b * 4, s, s, self.cfg.fpn.out_channels), self.dtype)
        cls, reg = self.bbox_head(dummy)
        if self.cfg.mask_head is not None:
            self.mask_head(dummy)
        return cls, reg

    def loss(
        self,
        images,
        gt_boxes,
        gt_labels,
        gt_mask,
        img_shapes,
        gt_mask_crops=None,
        proposals=None,  # (B, P, 4) REQUIRED
        proposal_valid=None,  # (B, P) bool; default all-valid
    ) -> Dict[str, jnp.ndarray]:
        if proposals is None:
            raise ValueError("FastRCNN.loss requires precomputed proposals")
        if proposal_valid is None:
            proposal_valid = jnp.ones(proposals.shape[:2], bool)
        prop = _FixedProposals(boxes=proposals, valid=proposal_valid)
        losses, feats, targets = self._loss_core(
            images, gt_boxes, gt_labels, gt_mask, img_shapes, proposals=prop
        )
        if self.cfg.mask_head is not None and gt_mask_crops is not None:
            self._mask_branch(feats, targets, gt_boxes, gt_mask_crops, losses)
        return losses

    def predict(
        self,
        images,
        img_shapes,
        scale_factors,
        proposals=None,  # (B, P, 4) REQUIRED, network scale
        proposal_valid=None,
        rescale: bool = True,
    ) -> Detections:
        if proposals is None:
            raise ValueError("FastRCNN.predict requires precomputed proposals")
        if proposal_valid is None:
            proposal_valid = jnp.ones(proposals.shape[:2], bool)
        feats = self.extract_feats(images)
        return self._predict_feats(
            feats,
            images,
            img_shapes,
            scale_factors,
            rescale,
            proposals=_FixedProposals(boxes=proposals, valid=proposal_valid),
        )


class _FixedProposals:
    """Duck-typed stand-in for rpn.Proposals (boxes + valid)."""

    def __init__(self, boxes, valid):
        self.boxes = boxes
        self.valid = valid


class GridRCNN(FasterRCNN):
    """Grid R-CNN (grid_rcnn.py): classification from the bbox head,
    localization from grid-point heatmaps."""

    def _setup_extra(self):
        self.grid_head = GridHead(
            heatmap_size=self.cfg.variant.grid_heatmap_size,
            dtype=self.dtype,
            name="grid_head",
        )

    def __call__(self, images):
        out = super().__call__(images)
        s = self.cfg.variant.grid_heatmap_size // 4
        self.grid_head(
            jnp.zeros((2, s, s, self.cfg.fpn.out_channels), self.dtype)
        )
        return out

    def loss(
        self, images, gt_boxes, gt_labels, gt_mask, img_shapes,
        gt_mask_crops=None,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        v = c.variant
        losses, feats, targets = self._loss_core(
            images, gt_boxes, gt_labels, gt_mask, img_shapes
        )

        # --- grid branch on jittered positives (grid_rcnn.py:176-196) ---
        s = c.rcnn_train.sampler.num
        cap = max(int(s * c.rcnn_train.sampler.pos_fraction), 1)
        b = targets.rois.shape[0]
        pos_rois = targets.rois[:, :cap]
        pos_valid = (targets.labels[:, :cap] > 0) & targets.roi_valid[:, :cap]

        # _random_jitter (grid_rcnn.py:58-81): uniform(-a, a) offsets on
        # center (in wh units) and log-ish scale on wh, clipped to image
        key = self.make_rng("sampling")
        off = jax.random.uniform(
            key, pos_rois.shape, minval=-v.grid_jitter, maxval=v.grid_jitter
        )
        cxcy = (pos_rois[..., :2] + pos_rois[..., 2:]) * 0.5
        wh = jnp.abs(pos_rois[..., 2:] - pos_rois[..., :2])
        new_c = cxcy + wh * off[..., :2]
        new_wh = wh * (1.0 + off[..., 2:])
        j1 = new_c - new_wh * 0.5
        j2 = new_c + new_wh * 0.5
        hi = jnp.stack([img_shapes[:, 1], img_shapes[:, 0]], -1) - 1.0
        j1 = jnp.clip(j1, 0.0, hi[:, None, :])
        j2 = jnp.clip(j2, 0.0, hi[:, None, :])
        jit_rois = jnp.concatenate([j1, j2], axis=-1)

        # pool at heatmap/4 (the grid head's two deconvs upsample 4x)
        g_pooled = batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            jit_rois,
            c.roi_extractor.featmap_strides,
            v.grid_heatmap_size // 4,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )
        flat = lambda x: x.reshape(b * cap, *x.shape[2:])
        heat_logits = self.grid_head(flat(g_pooled))  # (N, hm, hm, 9)

        # targets: grid points of the ASSIGNED gt in jittered-roi frame
        pos_gt = jnp.take_along_axis(
            gt_boxes, jnp.maximum(targets.pos_gt_inds[:, :cap], 0)[..., None], axis=1
        )
        heat_t, point_valid = grid_targets(
            flat(jit_rois), flat(pos_gt), v.grid_heatmap_size
        )
        # BCE-with-logits per point heatmap, mean over valid positive rois
        # (grid_head.py loss uses BCE on the fused maps)
        lg = jnp.clip(heat_logits.astype(jnp.float32), -30, 30)
        bce = jnp.maximum(lg, 0) - lg * heat_t + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        w = (flat(pos_valid)[:, None] * point_valid).astype(jnp.float32)
        per_roi = (bce.mean(axis=(1, 2)) * w).sum(-1)
        losses["loss_grid"] = per_roi.sum() / jnp.maximum(w.sum(), 1.0)
        return losses

    def predict(
        self, images, img_shapes, scale_factors, rescale: bool = True
    ) -> Detections:
        """simple_test (grid_rcnn.py:200-229): standard detection path,
        then boxes are replaced by grid-decoded ones."""
        c = self.cfg
        v = c.variant
        feats = self.extract_feats(images)
        dets = self._predict_feats(
            feats, images, img_shapes, scale_factors, rescale=False
        )
        b, m = dets.boxes.shape[:2]
        g_pooled = batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            dets.boxes,
            c.roi_extractor.featmap_strides,
            v.grid_heatmap_size // 4,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )
        flat = lambda x: x.reshape(b * m, *x.shape[2:])
        heat = self.grid_head(flat(g_pooled))
        refined = grid_to_boxes(heat, flat(dets.boxes)).reshape(b, m, 4)
        # clip to image, then rescale to the original frame like the
        # reference (det_bboxes[:, :4] /= scale_factor)
        hi = jnp.stack([img_shapes[:, 1], img_shapes[:, 0]], -1) - 1.0
        refined = jnp.clip(
            refined,
            0.0,
            jnp.concatenate([hi, hi], -1)[:, None, :],
        )
        if rescale:
            refined = refined / scale_factors[:, None, None]
        return Detections(
            boxes=refined, scores=dets.scores, labels=dets.labels,
            valid=dets.valid,
        )


class MaskScoringRCNN(FasterRCNN):
    """Mask Scoring R-CNN (mask_scoring_rcnn.py): Mask R-CNN whose
    detection scores are rescored by a learned mask-IoU head."""

    def _setup_extra(self):
        assert self.cfg.mask_head is not None, "MaskScoringRCNN needs a mask head"
        self.mask_iou_head = MaskIoUHead(
            num_classes=self.cfg.mask_head.num_classes,
            dtype=self.dtype,
            name="mask_iou_head",
        )

    def __call__(self, images):
        out = super().__call__(images)
        s = self.cfg.mask_head.mask_size // 2
        self.mask_iou_head(
            jnp.zeros((2, s, s, self.cfg.fpn.out_channels), self.dtype),
            jnp.zeros((2, 2 * s, 2 * s), self.dtype),
        )
        return out

    def loss(
        self, images, gt_boxes, gt_labels, gt_mask, img_shapes,
        gt_mask_crops=None,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        losses, feats, targets = self._loss_core(
            images, gt_boxes, gt_labels, gt_mask, img_shapes
        )
        if gt_mask_crops is None:
            return losses
        aux = self._mask_branch(feats, targets, gt_boxes, gt_mask_crops, losses)

        # --- mask-iou branch (mask_scoring_rcnn.py:152-166) -------------
        b = targets.rois.shape[0]
        cap = aux["mask_cap"]
        flat = lambda x: x.reshape(b * cap, *x.shape[2:])
        pred_prob = jax.nn.sigmoid(
            flat(aux["mask_logits"]).astype(jnp.float32)
        )  # (N, 2S, 2S) selected-class probs
        iou_logits = self.mask_iou_head(
            flat(aux["m_pooled"]), pred_prob
        )  # (N, num_fg)
        labels0 = jnp.clip(flat(aux["m_labels"]) - 1, 0, iou_logits.shape[-1] - 1)
        iou_pred = jnp.take_along_axis(
            iou_logits.astype(jnp.float32), labels0[:, None], axis=-1
        )[:, 0]

        # target: IoU of the binarized prediction vs the gt crop, corrected
        # by the gt area outside the proposal (maskiou_head.py get_target).
        # full_areas = (gt area inside proposal) / (full gt area):
        # in-proposal area in pixels = mean(m_targets) * area(proposal);
        # full gt area in pixels = mean(gt crop) * area(gt box).
        m_rois = flat(aux["m_rois"])
        prop_area = jnp.maximum(
            (m_rois[:, 2] - m_rois[:, 0]) * (m_rois[:, 3] - m_rois[:, 1]), 1.0
        )
        gi = jnp.maximum(targets.pos_gt_inds[:, :cap], 0)
        pos_gt = jnp.take_along_axis(gt_boxes, gi[..., None], axis=1)
        pos_gt = flat(pos_gt)
        gt_area = jnp.maximum(
            (pos_gt[:, 2] - pos_gt[:, 0]) * (pos_gt[:, 3] - pos_gt[:, 1]), 1.0
        )
        crops = flat(jnp.take_along_axis(
            gt_mask_crops, gi[..., None, None], axis=1
        ))
        in_prop = flat(aux["m_targets"]).mean(axis=(-2, -1)) * prop_area
        full = jnp.maximum(crops.mean(axis=(-2, -1)) * gt_area, 1.0)
        area_ratio = jnp.clip(in_prop / full, 0.0, 1.0)
        iou_t = mask_iou_target(
            pred_prob, flat(aux["m_targets"]), area_ratio
        )
        w = flat(aux["m_pos"]).astype(jnp.float32)
        losses["loss_mask_iou"] = (
            0.5 * jnp.square(iou_pred - jax.lax.stop_gradient(iou_t)) * w
        ).sum() / jnp.maximum(w.sum(), 1.0)
        return losses

    def predict_with_masks(
        self, images, img_shapes, scale_factors, rescale: bool = True
    ):
        """Detections + masks + mask scores (det score x predicted mask
        IoU, maskiou_head.py get_mask_scores) from one backbone pass."""
        c = self.cfg
        feats = self.extract_feats(images)
        dets = self._predict_feats(
            feats, images, img_shapes, scale_factors, rescale
        )
        rois = dets.boxes * (
            scale_factors[:, None, None] if rescale else 1.0
        )
        pooled = batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            rois,
            c.roi_extractor.featmap_strides,
            c.mask_head.mask_size // 2,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )
        sel = self.mask_head(pooled, labels=dets.labels)
        probs = jax.nn.sigmoid(sel.astype(jnp.float32))
        b, m = dets.boxes.shape[:2]
        flat = lambda x: x.reshape(b * m, *x.shape[2:])
        iou_logits = self.mask_iou_head(flat(pooled), flat(probs))
        iou_pred = jnp.take_along_axis(
            iou_logits.astype(jnp.float32),
            jnp.clip(flat(dets.labels), 0, iou_logits.shape[-1] - 1)[:, None],
            axis=-1,
        )[:, 0].reshape(b, m)
        mask_scores = dets.scores * iou_pred
        return dets, probs.astype(self.dtype), mask_scores


class DoubleHeadRCNN(FasterRCNN):
    """Double-Head R-CNN (double_head_rcnn.py): conv branch regresses from
    rois inflated by reg_roi_scale_factor, fc branch classifies from the
    plain rois."""

    def _make_bbox_head(self):
        from .extra_heads import DoubleConvFCBBoxHead

        c = self.cfg.bbox_head
        return DoubleConvFCBBoxHead(
            num_classes=c.num_classes,
            fc_out_channels=c.fc_out_channels,
            reg_class_agnostic=c.reg_class_agnostic,
            dtype=self.dtype,
            name="bbox_head",
        )

    def _bbox_forward(self, feats, rois):
        c = self.cfg
        pool = lambda r: batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            r,
            c.roi_extractor.featmap_strides,
            c.roi_extractor.out_size,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )
        cls_feats = pool(rois)
        reg_feats = pool(_scale_rois(rois, c.variant.reg_roi_scale_factor))
        return self.bbox_head(cls_feats, reg_feats)


VARIANTS = {
    "fast": FastRCNN,
    "grid": GridRCNN,
    "mask_scoring": MaskScoringRCNN,
    "double_head": DoubleHeadRCNN,
}


def build_variant(cfg, partition=None, class_weights=None, dtype=jnp.float32):
    kind = cfg.variant.kind
    if kind not in VARIANTS:
        raise ValueError(f"unknown detector variant {kind!r}")
    return VARIANTS[kind](
        cfg=cfg, partition=partition, class_weights=class_weights, dtype=dtype
    )

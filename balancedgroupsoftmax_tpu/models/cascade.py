"""Cascade R-CNN (host for per-stage grouped-softmax heads).

Parity: /root/reference/mmdet/models/detectors/cascade_rcnn.py — staged
training with rising assigner IoU thresholds and tightening target stds
(forward_train :207-298), roi refinement between stages via the previous
stage's class-agnostic regression (`regress_by_class`, bbox_head.py:211),
and staged testing with the three stages' class scores averaged before the
final decode + NMS (:300-443, GS merge applied to averaged logits per
gs_bbox_head_with0.py:352-353).

Shares the TPU-native machinery of detector.py: vmapped fixed-capacity
assignment/sampling, multi-level RoIAlign, fixpoint NMS.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DetectorConfig
from ..core.targets import roi_targets_single
from ..gs.head import gs_loss, gs_merge_scores
from ..gs.partition import GSPartition
from ..kernels import batched_multiclass_nms, batched_multilevel_roi_align
from ..ops.boxes import delta2bbox
from .bbox_head import SharedFCBBoxHead, bbox_head_loss, bbox_reg_loss
from .detector import Detections
from .fpn import FPN
from .resnet import ResNet
from .rpn import RPNHead, rpn_loss, rpn_proposals_batched, rpn_proposals_single


class CascadeRCNN(nn.Module):
    cfg: DetectorConfig  # cfg.cascade must be set
    partition: Optional[GSPartition] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        import dataclasses

        c = self.cfg
        assert c.cascade is not None
        self.backbone = ResNet(
            depth=c.backbone.depth,
            groups=c.backbone.groups,
            base_width=c.backbone.base_width,
            dcn_stages=c.backbone.dcn_stages,
            dcn_modulated=c.backbone.dcn_modulated,
            dcn_groups=c.backbone.dcn_groups or 0,
            dcn_shift_window=c.backbone.dcn_shift_window,
            remat=c.backbone.remat,
            dtype=self.dtype,
            name="backbone",
        )
        self.neck = FPN(
            out_channels=c.fpn.out_channels, num_outs=c.fpn.num_outs,
            dtype=self.dtype, name="neck",
        )
        self.rpn_head = RPNHead(
            feat_channels=c.fpn.out_channels,
            num_anchors=c.anchors.num_base_anchors,
            dtype=self.dtype,
            name="rpn_head",
        )
        heads = []
        for i in range(c.cascade.num_stages):
            head_cfg = dataclasses.replace(
                c.bbox_head,
                reg_class_agnostic=True,
                target_stds=c.cascade.stage_target_stds[i],
            )
            heads.append(
                SharedFCBBoxHead(head_cfg, dtype=self.dtype, name=f"bbox_head_{i}")
            )
        self.bbox_heads = heads

    def extract_feats(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images):
        feats = self.extract_feats(images)
        rpn_outs = self.rpn_head(feats)
        s = self.cfg.roi_extractor.out_size
        dummy = jnp.zeros((images.shape[0], s, s, self.cfg.fpn.out_channels), self.dtype)
        outs = [h(dummy) for h in self.bbox_heads]
        return rpn_outs, outs

    def _anchors(self, images):
        # anchor grid sizes come from the ACTUAL padded batch shape, not
        # the config default: the pipeline emits TWO static buckets
        # (landscape/portrait) and jit retraces per shape — anchors built
        # from a fixed cfg.image_size would silently transpose for
        # whichever bucket the config does not match (equal per-level
        # anchor counts, so nothing crashes — RPN targets are just wrong)
        from ..core.anchors import multilevel_anchors

        c = self.cfg
        h, w = images.shape[1], images.shape[2]
        sizes = [(-(-h // s), -(-w // s)) for s in c.anchors.strides]
        return [
            jnp.asarray(a)
            for a in multilevel_anchors(
                sizes, c.anchors.strides, c.anchors.scales, c.anchors.ratios
            )
        ]

    def _pool(self, feats, rois_batch):
        c = self.cfg
        return batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            rois_batch,
            c.roi_extractor.featmap_strides,
            c.roi_extractor.out_size,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )

    def loss(
        self,
        images: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_labels: jnp.ndarray,
        gt_mask: jnp.ndarray,
        img_shapes: jnp.ndarray,
        gt_mask_crops=None,  # accepted for train-step interface parity
    ) -> Dict[str, jnp.ndarray]:
        import dataclasses

        c = self.cfg
        b = images.shape[0]
        key = self.make_rng("sampling")
        feats = self.extract_feats(images)
        rpn_outs = self.rpn_head(feats)
        anchors = self._anchors(images)
        anchors_flat = jnp.concatenate(anchors, axis=0)

        k_rpn, key = jax.random.split(key)
        loss_rpn_cls, loss_rpn_bbox = rpn_loss(
            rpn_outs,
            anchors_flat,
            jnp.ones(anchors_flat.shape[0], bool),
            gt_boxes,
            gt_mask,
            (images.shape[1], images.shape[2]),
            jax.random.split(k_rpn, b),
            c.rpn_train,
        )
        losses = {"loss_rpn_cls": loss_rpn_cls, "loss_rpn_bbox": loss_rpn_bbox}

        detached = [
            (jax.lax.stop_gradient(cm), jax.lax.stop_gradient(rm)) for cm, rm in rpn_outs
        ]
        proposals = rpn_proposals_batched(
            detached, anchors, img_shapes, c.rpn_proposal_train
        )
        prop_boxes, prop_valid = proposals.boxes, proposals.valid

        s = c.rcnn_train.sampler.num
        flat = lambda x: x.reshape(b * s, *x.shape[2:])
        for i in range(c.cascade.num_stages):
            stage_cfg = dataclasses.replace(
                c.rcnn_train,
                assigner=dataclasses.replace(
                    c.rcnn_train.assigner,
                    pos_iou_thr=c.cascade.stage_pos_ious[i],
                    neg_iou_thr=c.cascade.stage_pos_ious[i],
                    min_pos_iou=c.cascade.stage_pos_ious[i],
                ),
            )
            k_stage, key = jax.random.split(key)
            stds = c.cascade.stage_target_stds[i]
            targets = jax.vmap(
                lambda k, pb, pv, gb, gl, gm: roi_targets_single(
                    k, pb, pv, gb, gl, gm, stage_cfg,
                    target_means=c.bbox_head.target_means, target_stds=stds,
                )
            )(
                jax.random.split(k_stage, b),
                prop_boxes,
                prop_valid,
                gt_boxes,
                gt_labels,
                gt_mask,
            )
            pooled = self._pool(feats, targets.rois)
            cls_logits, bbox_deltas = self.bbox_heads[i](pooled)
            w_stage = c.cascade.stage_loss_weights[i]

            if c.bbox_head.use_gs:
                k_gs, key = jax.random.split(key)
                gs_losses = gs_loss(
                    k_gs,
                    flat(cls_logits),
                    flat(targets.labels),
                    flat(targets.roi_valid),
                    self.partition,
                    c.bbox_head.gs.others_sample_ratio,
                )
                for name, v in gs_losses.items():
                    losses[f"s{i}.{name}"] = v * w_stage
            else:
                from ..ops.losses import softmax_cross_entropy

                avg = jnp.maximum(jnp.sum(flat(targets.label_weights) > 0), 1.0)
                losses[f"s{i}.loss_cls"] = w_stage * softmax_cross_entropy(
                    flat(cls_logits).astype(jnp.float32),
                    flat(targets.labels),
                    weight=flat(targets.label_weights),
                    avg_factor=avg,
                )
            losses[f"s{i}.loss_bbox"] = w_stage * bbox_reg_loss(
                flat(bbox_deltas),
                flat(targets.labels),
                flat(targets.bbox_targets),
                flat(targets.bbox_weights),
                reg_class_agnostic=True,
            )

            # refine proposals for the next stage (cascade_rcnn.py:290-296)
            if i < c.cascade.num_stages - 1:
                refined = jax.vmap(
                    lambda rois, deltas, shape: delta2bbox(
                        rois,
                        jax.lax.stop_gradient(deltas.astype(jnp.float32)),
                        c.bbox_head.target_means,
                        stds,
                        max_shape=(shape[0], shape[1]),
                    )
                )(targets.rois, bbox_deltas, img_shapes)
                prop_boxes = refined
                prop_valid = targets.roi_valid
        return losses

    def _run_stages(self, feats, rois, img_shapes):
        """Shared multi-stage test loop (cascade test :363-390): pool +
        score with each stage's head, refining the rois between stages
        with that stage's class-agnostic regression. Returns the refined
        rois, the stage-averaged class scores, and the LAST stage's raw
        deltas (the reference decodes the final boxes from those)."""
        c = self.cfg
        ms_logits = []
        bbox_deltas = None
        for i in range(c.cascade.num_stages):
            pooled = self._pool(feats, rois)
            cls_logits, bbox_deltas = self.bbox_heads[i](pooled)
            ms_logits.append(cls_logits.astype(jnp.float32))
            if i < c.cascade.num_stages - 1:
                # refine with this stage's regression (cascade test :363-377)
                stds = c.cascade.stage_target_stds[i]
                rois = jax.vmap(
                    lambda r, d, shape: delta2bbox(
                        r,
                        d.astype(jnp.float32),
                        c.bbox_head.target_means,
                        stds,
                        max_shape=(shape[0], shape[1]),
                    )
                )(rois, bbox_deltas, img_shapes)

        avg_logits = sum(ms_logits) / len(ms_logits)
        if c.bbox_head.use_gs:
            scores = jax.vmap(lambda lg: gs_merge_scores(lg, self.partition))(avg_logits)
        else:
            scores = jax.nn.softmax(avg_logits, axis=-1)
        return rois, scores, bbox_deltas

    def predict(
        self,
        images: jnp.ndarray,
        img_shapes: jnp.ndarray,
        scale_factors: jnp.ndarray,
        rescale: bool = True,
    ) -> Detections:
        c = self.cfg
        feats = self.extract_feats(images)
        rpn_outs = self.rpn_head(feats)
        anchors = self._anchors(images)
        proposals = rpn_proposals_batched(
            rpn_outs, anchors, img_shapes, c.rpn_proposal_test
        )

        rois, scores, bbox_deltas = self._run_stages(
            feats, proposals.boxes, img_shapes
        )
        last_stds = c.cascade.stage_target_stds[-1]

        def decode(r, d, shape, sf):
            boxes = delta2bbox(
                r,
                d.astype(jnp.float32),
                c.bbox_head.target_means,
                last_stds,
                max_shape=(shape[0], shape[1]),
            )
            return boxes / sf if rescale else boxes

        boxes = jax.vmap(decode)(rois, bbox_deltas, img_shapes, scale_factors)
        db, ds, dl, dv = batched_multiclass_nms(
            boxes, scores, proposals.valid,
            c.rcnn_test.score_thr, c.rcnn_test.nms_iou_thr, c.rcnn_test.max_per_img,
            candidates_per_class=c.rcnn_test.nms_candidates_per_class,
            nms_type=c.rcnn_test.nms_type,
        )
        return Detections(boxes=db, scores=ds, labels=dl, valid=dv)

    def propose(
        self,
        images: jnp.ndarray,  # (B, H, W, 3)
        img_shapes: jnp.ndarray,  # (B, 2)
    ):
        """RPN proposals for one test view, in the VIEW frame (the per-view
        step of aug_test_rpn, test_mixins.py:21-36; caller merges)."""
        feats = self.extract_feats(images)
        rpn_outs = self.rpn_head(feats)
        anchors = self._anchors(images)
        return rpn_proposals_batched(
            rpn_outs, anchors, img_shapes, self.cfg.rpn_proposal_test
        )

    def rescore(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) one test view
        rois: jnp.ndarray,  # (B, P, 4) shared proposals mapped into this view
        img_shapes: jnp.ndarray,  # (B, 2) view content shape
    ):
        """Score a FIXED shared proposal set against this view's features
        through the full stage cascade (the reference's CascadeRCNN.aug_test,
        cascade_rcnn.py:300-443: per-view stage loop over the shared merged
        proposals, stage-averaged scores, boxes decoded from the refined
        rois with the last stage's deltas, rescale=False — the caller maps
        back to the original frame and averages, merge_augs.py:46-70).
        Returns (boxes (B, P, 4) class-agnostic, scores (B, P, C))."""
        c = self.cfg
        feats = self.extract_feats(images)
        rois, scores, bbox_deltas = self._run_stages(feats, rois, img_shapes)
        last_stds = c.cascade.stage_target_stds[-1]
        boxes = jax.vmap(
            lambda r, d, shape: delta2bbox(
                r,
                d.astype(jnp.float32),
                c.bbox_head.target_means,
                last_stds,
                max_shape=(shape[0], shape[1]),
            )
        )(rois, bbox_deltas, img_shapes)
        return boxes, scores


def build_cascade(cfg: DetectorConfig, partition=None, dtype=jnp.float32) -> CascadeRCNN:
    if cfg.bbox_head.use_gs and partition is None:
        raise ValueError("GS heads require a GSPartition")
    return CascadeRCNN(cfg=cfg, partition=partition, dtype=dtype)

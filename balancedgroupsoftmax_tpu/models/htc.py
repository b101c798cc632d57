"""Hybrid Task Cascade (HTC) — cascade + semantic branch + mask info flow.

Parity: /root/reference/mmdet/models/detectors/htc.py —
- semantic branch: FusedSemanticHead over FPN levels, pixel CE loss
  (htc.py:56-64), and RoI-pooled semantic features added to bbox/mask roi
  feats (`semantic_fusion`, htc.py:86-94);
- interleaved training: boxes refined (no grad) before each stage's mask
  branch, with re-assignment on the refined boxes (htc.py forward_train);
- mask information flow: stage i's mask head consumes the accumulated
  feature of heads 0..i-1 through their conv_res (htc.py:96-112); at test
  time mask logits of all stages are summed progressively then averaged
  (htc.py:142-155 + aug_test average).

Built from the same TPU primitives as cascade.py. The GS variant puts the
grouped-softmax head in every stage (configs/bags/gs_htc_*).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DetectorConfig
from ..core.targets import roi_targets_single
from ..gs.head import gs_loss, gs_merge_scores
from ..gs.partition import GSPartition
from ..ops.boxes import delta2bbox
from ..ops.mask import mask_target_single
from ..kernels import batched_multiclass_nms, batched_multilevel_roi_align
from .bbox_head import SharedFCBBoxHead, bbox_reg_loss
from .detector import Detections
from .fpn import FPN
from .mask_head import FCNMaskHead, mask_head_loss
from .resnet import ResNet
from .rpn import RPNHead, rpn_loss, rpn_proposals_batched, rpn_proposals_single
from .semantic_head import FusedSemanticHead, semantic_seg_loss


class HTC(nn.Module):
    cfg: DetectorConfig  # cfg.cascade and cfg.htc must be set
    partition: Optional[GSPartition] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        assert c.cascade is not None and c.htc is not None and c.mask_head is not None
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
        self.semantic_head = FusedSemanticHead(
            num_ins=c.fpn.num_outs,
            fusion_level=c.htc.fusion_level,
            num_classes=c.htc.semantic_num_classes,
            conv_out_channels=c.fpn.out_channels,
            dtype=self.dtype,
            name="semantic_head",
        )
        heads, mheads = [], []
        for i in range(c.cascade.num_stages):
            head_cfg = dataclasses.replace(
                c.bbox_head,
                reg_class_agnostic=True,
                target_stds=c.cascade.stage_target_stds[i],
            )
            heads.append(
                SharedFCBBoxHead(head_cfg, dtype=self.dtype, name=f"bbox_head_{i}")
            )
            mheads.append(
                FCNMaskHead(
                    c.mask_head,
                    with_conv_res=c.htc.mask_info_flow and i > 0,
                    dtype=self.dtype,
                    name=f"mask_head_{i}",
                )
            )
        self.bbox_heads = heads
        self.mask_heads = mheads

    # --- shared helpers ---------------------------------------------------
    def extract_feats(self, images):
        return self.neck(self.backbone(images))

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

    def _pool(self, feats, rois_batch, out_size=None):
        c = self.cfg
        return batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            rois_batch,
            c.roi_extractor.featmap_strides,
            out_size or c.roi_extractor.out_size,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )

    def _pool_semantic(self, semantic_feat, rois_batch, out_size):
        """Pool the stride-8 semantic feature for the given rois
        (semantic_roi_extractor: single level, featmap_strides=[8]).
        A single-level pyramid routes every roi to level 0."""
        c = self.cfg
        stride = c.anchors.strides[c.htc.fusion_level]
        return batched_multilevel_roi_align(
            (semantic_feat,),
            rois_batch,
            (stride,),
            out_size,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )

    def __call__(self, images):
        feats = self.extract_feats(images)
        rpn_outs = self.rpn_head(feats)
        seg_logits, sem_feat = self.semantic_head(feats)
        s = self.cfg.roi_extractor.out_size
        m = self.cfg.mask_head.mask_size // 2
        b = images.shape[0]
        dummy_b = jnp.zeros((b, s, s, self.cfg.fpn.out_channels), self.dtype)
        dummy_m = jnp.zeros((b, m, m, self.cfg.fpn.out_channels), self.dtype)
        # info-flow res_feat carries the previous head's conv feature width
        dummy_res = jnp.zeros(
            (b, m, m, self.cfg.mask_head.conv_out_channels), self.dtype
        )
        outs = [h(dummy_b) for h in self.bbox_heads]
        for i, mh in enumerate(self.mask_heads):
            mh(dummy_m, res_feat=dummy_res if (self.cfg.htc.mask_info_flow and i > 0) else None)
        return rpn_outs, outs, seg_logits

    def _run_stages(self, feats, sem_feat, rois, img_shapes):
        """Shared multi-stage test loop with semantic fusion (htc.py:86-94 +
        cascade test :363-390). Returns the refined rois, stage-averaged
        class scores, and the last stage's raw deltas."""
        c = self.cfg
        ms_logits = []
        bbox_deltas = None
        for i in range(c.cascade.num_stages):
            pooled = self._pool(feats, rois)
            if "bbox" in c.htc.semantic_fusion:
                pooled = pooled + self._pool_semantic(
                    sem_feat, rois, c.roi_extractor.out_size
                ).astype(pooled.dtype)
            cls_logits, bbox_deltas = self.bbox_heads[i](pooled)
            ms_logits.append(cls_logits.astype(jnp.float32))
            if i < c.cascade.num_stages - 1:
                stds = c.cascade.stage_target_stds[i]
                rois = jax.vmap(
                    lambda r, d, shape: delta2bbox(
                        r, d.astype(jnp.float32), c.bbox_head.target_means,
                        stds, max_shape=(shape[0], shape[1]),
                    )
                )(rois, bbox_deltas, img_shapes)

        avg_logits = sum(ms_logits) / len(ms_logits)
        if c.bbox_head.use_gs:
            scores = jax.vmap(lambda lg: gs_merge_scores(lg, self.partition))(avg_logits)
        else:
            scores = jax.nn.softmax(avg_logits, axis=-1)
        return rois, scores, bbox_deltas

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
        img_shapes: jnp.ndarray,  # (B, 2)
    ):
        """Score a FIXED shared proposal set on this view through the full
        semantic-fused stage cascade (HTC aug path = CascadeRCNN.aug_test,
        cascade_rcnn.py:300-443, with htc.py:86-94 fusion). Returns
        (boxes (B, P, 4) class-agnostic view-frame, scores (B, P, C))."""
        c = self.cfg
        feats = self.extract_feats(images)
        _, sem_feat = self.semantic_head(feats)
        rois, scores, bbox_deltas = self._run_stages(
            feats, sem_feat, rois, img_shapes
        )
        last_stds = c.cascade.stage_target_stds[-1]
        boxes = jax.vmap(
            lambda r, d, shape: delta2bbox(
                r, d.astype(jnp.float32), c.bbox_head.target_means,
                last_stds, max_shape=(shape[0], shape[1]),
            )
        )(rois, bbox_deltas, img_shapes)
        return boxes, scores

    # --- training ---------------------------------------------------------
    def loss(
        self,
        images: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_labels: jnp.ndarray,
        gt_mask: jnp.ndarray,
        img_shapes: jnp.ndarray,
        gt_mask_crops: jnp.ndarray,  # (B, G, CROP, CROP)
        gt_semantic_seg: Optional[jnp.ndarray] = None,  # (B, H/8, W/8) int32
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        b = images.shape[0]
        key = self.make_rng("sampling")
        feats = self.extract_feats(images)
        rpn_outs = self.rpn_head(feats)
        seg_logits, sem_feat = self.semantic_head(feats)
        anchors = self._anchors(images)
        anchors_flat = jnp.concatenate(anchors, axis=0)

        k_rpn, key = jax.random.split(key)
        loss_rpn_cls, loss_rpn_bbox = rpn_loss(
            rpn_outs, anchors_flat, jnp.ones(anchors_flat.shape[0], bool),
            gt_boxes, gt_mask, (images.shape[1], images.shape[2]),
            jax.random.split(k_rpn, b), c.rpn_train,
        )
        losses = {"loss_rpn_cls": loss_rpn_cls, "loss_rpn_bbox": loss_rpn_bbox}
        if gt_semantic_seg is not None:
            losses["loss_semantic_seg"] = semantic_seg_loss(
                seg_logits, gt_semantic_seg,
                c.htc.semantic_ignore_label, c.htc.semantic_loss_weight,
            )

        detached = [
            (jax.lax.stop_gradient(cm), jax.lax.stop_gradient(rm)) for cm, rm in rpn_outs
        ]
        proposals = rpn_proposals_batched(
            detached, anchors, img_shapes, c.rpn_proposal_train
        )
        prop_boxes, prop_valid = proposals.boxes, proposals.valid

        s = c.rcnn_train.sampler.num
        mask_cap = max(int(s * c.rcnn_train.sampler.pos_fraction), 1)
        flat = lambda x: x.reshape(b * s, *x.shape[2:])
        flat_m = lambda x: x.reshape(b * mask_cap, *x.shape[2:])

        def stage_targets(k, boxes, valid, stage_cfg, stds):
            return jax.vmap(
                lambda kk, pb, pv, gb, gl, gm: roi_targets_single(
                    kk, pb, pv, gb, gl, gm, stage_cfg,
                    target_means=c.bbox_head.target_means, target_stds=stds,
                )
            )(jax.random.split(k, b), boxes, valid, gt_boxes, gt_labels, gt_mask)

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
            stds = c.cascade.stage_target_stds[i]
            k_stage, key = jax.random.split(key)
            targets = stage_targets(k_stage, prop_boxes, prop_valid, stage_cfg, stds)

            pooled = self._pool(feats, targets.rois)
            if "bbox" in c.htc.semantic_fusion:
                pooled = pooled + self._pool_semantic(
                    sem_feat, targets.rois, c.roi_extractor.out_size
                ).astype(pooled.dtype)
            cls_logits, bbox_deltas = self.bbox_heads[i](pooled)
            w_stage = c.cascade.stage_loss_weights[i]

            if c.bbox_head.use_gs:
                k_gs, key = jax.random.split(key)
                for name, v in gs_loss(
                    k_gs, flat(cls_logits), flat(targets.labels),
                    flat(targets.roi_valid), self.partition,
                    c.bbox_head.gs.others_sample_ratio,
                ).items():
                    losses[f"s{i}.{name}"] = v * w_stage
            else:
                from ..ops.losses import softmax_cross_entropy

                avg = jnp.maximum(jnp.sum(flat(targets.label_weights) > 0), 1.0)
                losses[f"s{i}.loss_cls"] = w_stage * softmax_cross_entropy(
                    flat(cls_logits).astype(jnp.float32), flat(targets.labels),
                    weight=flat(targets.label_weights), avg_factor=avg,
                )
            losses[f"s{i}.loss_bbox"] = w_stage * bbox_reg_loss(
                flat(bbox_deltas), flat(targets.labels),
                flat(targets.bbox_targets), flat(targets.bbox_weights),
                reg_class_agnostic=True,
            )

            # --- interleaved refinement before the mask branch ------------
            refined = jax.vmap(
                lambda rois, deltas, shape: delta2bbox(
                    rois, jax.lax.stop_gradient(deltas.astype(jnp.float32)),
                    c.bbox_head.target_means, stds, max_shape=(shape[0], shape[1]),
                )
            )(targets.rois, bbox_deltas, img_shapes)
            if c.htc.interleaved:
                k_m, key = jax.random.split(key)
                m_targets_all = stage_targets(
                    k_m, refined, targets.roi_valid, stage_cfg, stds
                )
                m_rois = m_targets_all.rois[:, :mask_cap]
                m_labels = m_targets_all.labels[:, :mask_cap]
                m_gt_inds = m_targets_all.pos_gt_inds[:, :mask_cap]
                m_valid = m_targets_all.roi_valid[:, :mask_cap]
            else:
                m_rois = targets.rois[:, :mask_cap]
                m_labels = targets.labels[:, :mask_cap]
                m_gt_inds = targets.pos_gt_inds[:, :mask_cap]
                m_valid = targets.roi_valid[:, :mask_cap]
            m_pos = (m_labels > 0) & m_valid

            m_size = c.mask_head.mask_size // 2
            m_pooled = self._pool(feats, m_rois, out_size=m_size)
            if "mask" in c.htc.semantic_fusion:
                m_pooled = m_pooled + self._pool_semantic(
                    sem_feat, m_rois, m_size
                ).astype(m_pooled.dtype)

            # mask info flow (htc.py:96-112)
            last_feat = None
            if c.htc.mask_info_flow:
                for j in range(i):
                    _, last_feat = self.mask_heads[j](
                        m_pooled, res_feat=last_feat if j > 0 else None,
                        return_feat=True,
                    )
            if c.mask_head.class_agnostic:
                mask_logits = self.mask_heads[i](
                    m_pooled, res_feat=last_feat, return_feat=False
                )
                presel = False
            else:
                num_fg = c.mask_head.num_classes - 1
                mask_logits = self.mask_heads[i](
                    m_pooled, res_feat=last_feat, return_feat=False,
                    labels=jnp.clip(m_labels - 1, 0, num_fg - 1),
                )
                presel = True
            m_t = jax.vmap(
                lambda rois, gb, gi, crops, pm: mask_target_single(
                    rois, gb, gi, crops, pm, c.mask_head.mask_size
                )
            )(m_rois, gt_boxes, m_gt_inds, gt_mask_crops, m_pos)
            losses[f"s{i}.loss_mask"] = w_stage * mask_head_loss(
                flat_m(mask_logits), flat_m(jax.lax.stop_gradient(m_t)),
                flat_m(m_labels), flat_m(m_pos),
                class_agnostic=c.mask_head.class_agnostic,
                preselected=presel,
            )

            if i < c.cascade.num_stages - 1:
                prop_boxes = refined
                prop_valid = targets.roi_valid
        return losses

    # --- inference --------------------------------------------------------
    def predict(
        self,
        images: jnp.ndarray,
        img_shapes: jnp.ndarray,
        scale_factors: jnp.ndarray,
        rescale: bool = True,
    ) -> Detections:
        feats = self.extract_feats(images)
        return self._predict_feats(
            feats, images, img_shapes, scale_factors, rescale
        )

    def _predict_feats(
        self, feats, images, img_shapes, scale_factors, rescale=True,
        sem_feat=None,
    ) -> Detections:
        c = self.cfg
        rpn_outs = self.rpn_head(feats)
        if sem_feat is None:
            _, sem_feat = self.semantic_head(feats)
        anchors = self._anchors(images)
        proposals = rpn_proposals_batched(
            rpn_outs, anchors, img_shapes, c.rpn_proposal_test
        )

        rois, scores, bbox_deltas = self._run_stages(
            feats, sem_feat, proposals.boxes, img_shapes
        )

        def decode(r, d, shape, sf):
            boxes = delta2bbox(
                r, d.astype(jnp.float32), c.bbox_head.target_means,
                c.cascade.stage_target_stds[-1], max_shape=(shape[0], shape[1]),
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

    def predict_masks(
        self,
        images: jnp.ndarray,
        det_boxes: jnp.ndarray,  # (B, M, 4) original scale
        det_labels: jnp.ndarray,
        scale_factors: jnp.ndarray,
    ) -> jnp.ndarray:
        """Average the per-stage mask logits with info flow (htc.py:142-155)."""
        feats = self.extract_feats(images)
        return self._masks_feats(feats, det_boxes, det_labels, scale_factors)

    def predict_with_masks(
        self,
        images: jnp.ndarray,
        img_shapes: jnp.ndarray,
        scale_factors: jnp.ndarray,
        rescale: bool = True,
    ):
        """Detections + masks from ONE backbone/semantic pass (the
        reference's HybridTaskCascade.simple_test computes feats and the
        semantic feature once for both branches, htc.py:157-199)."""
        feats = self.extract_feats(images)
        _, sem_feat = self.semantic_head(feats)
        dets = self._predict_feats(
            feats, images, img_shapes, scale_factors, rescale, sem_feat
        )
        # rois pool at network scale: with rescale=False the detections
        # already sit there, so no scale-back factor (see FasterRCNN
        # .predict_with_masks)
        masks = self._masks_feats(
            feats,
            dets.boxes,
            dets.labels,
            scale_factors if rescale else jnp.ones_like(scale_factors),
            sem_feat,
        )
        return dets, masks

    def _masks_feats(
        self, feats, det_boxes, det_labels, scale_factors, sem_feat=None
    ):
        c = self.cfg
        if sem_feat is None:
            _, sem_feat = self.semantic_head(feats)
        rois = det_boxes * scale_factors[:, None, None]
        m_size = c.mask_head.mask_size // 2
        pooled = self._pool(feats, rois, out_size=m_size)
        if "mask" in c.htc.semantic_fusion:
            pooled = pooled + self._pool_semantic(sem_feat, rois, m_size).astype(
                pooled.dtype
            )
        # class-selected per stage (selecting commutes with the stage
        # average) — never materializes the (B, M, 2S, 2S, 1230) tensors
        sel_labels = None if c.mask_head.class_agnostic else det_labels
        last_feat = None
        agg = None
        for i in range(c.cascade.num_stages):
            if c.htc.mask_info_flow:
                logits, last_feat = self.mask_heads[i](
                    pooled, res_feat=last_feat if i > 0 else None,
                    return_feat=True, labels=sel_labels,
                )
            else:
                logits = self.mask_heads[i](pooled, labels=sel_labels)
            agg = logits if agg is None else agg + logits
        avg = agg.astype(jnp.float32) / c.cascade.num_stages
        sel = avg[..., 0] if c.mask_head.class_agnostic else avg
        # model-dtype output: halves the per-step mask fetch on bf16 (see
        # FasterRCNN._masks_feats)
        return jax.nn.sigmoid(sel).astype(self.dtype)


def build_htc(cfg: DetectorConfig, partition=None, dtype=jnp.float32) -> HTC:
    if cfg.bbox_head.use_gs and partition is None:
        raise ValueError("GS heads require a GSPartition")
    return HTC(cfg=cfg, partition=partition, dtype=dtype)

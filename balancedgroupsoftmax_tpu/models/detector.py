"""Two-stage detectors (Faster R-CNN host for BAGS) as one flax module.

Parity: /root/reference/mmdet/models/detectors/two_stage.py
(forward_train :134-265, simple_test :267-290) and
mmdet/models/detectors/group_softmax.py (the BAGS detector is a
TwoStageDetector whose bbox head is grouped-softmax).

TPU-native restructuring: the per-image python loops of the reference
(assign/sample per image :190-210, proposal lists, per-class NMS) are
vmapped fixed-capacity tensor ops; the whole train forward — backbone to
losses — is a single jittable function of (params, batch, rng). Sampling
randomness uses flax's 'sampling' RNG stream instead of host np.random.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from ..core.anchors import multilevel_anchors
from ..core.targets import roi_targets_single
from ..gs.head import gs_loss, gs_merge_scores
from ..gs.partition import GSPartition
from ..kernels import batched_multiclass_nms, batched_multilevel_roi_align
from ..ops.boxes import delta2bbox
from ..ops.mask import mask_target_single
from .bbox_head import SharedFCBBoxHead, bbox_head_loss, bbox_reg_loss
from .fpn import FPN
from .mask_head import FCNMaskHead, mask_head_loss
from .resnet import ResNet
from .rpn import RPNHead, rpn_loss, rpn_proposals_batched, rpn_proposals_single


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, M, 4)
    scores: jnp.ndarray  # (B, M)
    labels: jnp.ndarray  # (B, M) int32, 0-based fg class
    valid: jnp.ndarray  # (B, M) bool


class FasterRCNN(nn.Module):
    cfg: DetectorConfig
    partition: Optional[GSPartition] = None  # required when cfg.bbox_head.use_gs
    class_weights: Optional[tuple] = None  # (C,) for loss_cls_type='reweight'
    dtype: jnp.dtype = jnp.float32

    # class attribute (not a dataclass field): FastRCNN (precomputed
    # proposals, models/variants.py) flips it to skip the RPN head
    HAS_RPN = True

    def setup(self):
        c = self.cfg
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
            out_channels=c.fpn.out_channels,
            num_outs=c.fpn.num_outs,
            dtype=self.dtype,
            name="neck",
        )
        if self.HAS_RPN:
            self.rpn_head = RPNHead(
                feat_channels=c.fpn.out_channels,
                num_anchors=c.anchors.num_base_anchors,
                dtype=self.dtype,
                name="rpn_head",
            )
        self.bbox_head = self._make_bbox_head()
        if c.mask_head is not None:
            self.mask_head = FCNMaskHead(c.mask_head, dtype=self.dtype, name="mask_head")
        self._setup_extra()

    def _make_bbox_head(self):
        """Overridable bbox-head factory (variants swap in e.g. the
        double conv/fc head, models/variants.py)."""
        return SharedFCBBoxHead(
            self.cfg.bbox_head, dtype=self.dtype, name="bbox_head"
        )

    def _setup_extra(self):
        """Hook for detector variants to register extra heads."""

    # --- building blocks -------------------------------------------------
    def extract_feats(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """images (B, H, W, 3) -> FPN levels ((B, H/4, W/4, C), ...)."""
        return self.neck(self.backbone(images))

    def rpn(self, feats):
        return self.rpn_head(feats)

    def roi_head(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, images):
        """Init/trace convenience: full forward producing rpn + dummy roi out."""
        feats = self.extract_feats(images)
        rpn_outs = self.rpn_head(feats)
        b = images.shape[0]
        s = self.cfg.roi_extractor.out_size
        dummy_rois = jnp.zeros((b * 4, s, s, self.cfg.fpn.out_channels), self.dtype)
        cls, reg = self.bbox_head(dummy_rois)
        if self.cfg.mask_head is not None:
            self.mask_head(dummy_rois)
        return rpn_outs, cls, reg

    # --- anchors (host-side constants, folded by XLA) --------------------
    def _anchors(self, images):
        # anchor grid sizes come from the ACTUAL padded batch shape, not
        # the config default: the pipeline emits TWO static buckets
        # (landscape/portrait) and jit retraces per shape — anchors built
        # from a fixed cfg.image_size would silently transpose for
        # whichever bucket the config does not match (equal per-level
        # anchor counts, so nothing crashes — RPN targets are just wrong)
        c = self.cfg
        h, w = images.shape[1], images.shape[2]
        sizes = [(-(-h // s), -(-w // s)) for s in c.anchors.strides]
        per_level = multilevel_anchors(
            sizes, c.anchors.strides, c.anchors.scales, c.anchors.ratios
        )
        return [jnp.asarray(a) for a in per_level]

    # --- training --------------------------------------------------------
    def loss(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) normalized, padded bucket
        gt_boxes: jnp.ndarray,  # (B, G, 4)
        gt_labels: jnp.ndarray,  # (B, G) int32 1-based
        gt_mask: jnp.ndarray,  # (B, G) bool
        img_shapes: jnp.ndarray,  # (B, 2) float32 — content (h, w) pre-padding
        gt_mask_crops: Optional[jnp.ndarray] = None,  # (B, G, CROP, CROP)
    ) -> Dict[str, jnp.ndarray]:
        losses, feats, targets = self._loss_core(
            images, gt_boxes, gt_labels, gt_mask, img_shapes
        )
        if self.cfg.mask_head is not None and gt_mask_crops is not None:
            self._mask_branch(feats, targets, gt_boxes, gt_mask_crops, losses)
        return losses

    def _bbox_forward(self, feats, rois):
        """Pool rois over the FPN levels and run the bbox head — the one
        place variants change how roi features feed classification and
        regression (e.g. DoubleHeadRCNN's separately-scaled reg branch)."""
        c = self.cfg
        pooled = batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            rois,
            c.roi_extractor.featmap_strides,
            c.roi_extractor.out_size,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )
        return self.bbox_head(pooled)

    def _loss_core(
        self, images, gt_boxes, gt_labels, gt_mask, img_shapes,
        proposals=None,
    ):
        """RPN + bbox-head losses; returns (losses, feats, roi targets) so
        variant subclasses can append their extra branches (grid, mask-iou)
        without a second backbone pass. `proposals` (a Proposals namedtuple)
        skips the RPN entirely — the FastRCNN precomputed-proposal path."""
        c = self.cfg
        b = images.shape[0]
        key = self.make_rng("sampling")
        k_rpn, k_roi = jax.random.split(key)

        feats = self.extract_feats(images)
        losses: Dict[str, jnp.ndarray] = {}

        if proposals is None:
            rpn_outs = self.rpn_head(feats)

            anchors = self._anchors(images)
            anchors_flat = jnp.concatenate(anchors, axis=0)
            anchor_valid = jnp.ones(anchors_flat.shape[0], dtype=bool)

            # RPN losses (batched over images inside rpn_loss)
            loss_rpn_cls, loss_rpn_bbox = rpn_loss(
                rpn_outs,
                anchors_flat,
                anchor_valid,
                gt_boxes,
                gt_mask,
                (images.shape[1], images.shape[2]),
                jax.random.split(k_rpn, b),
                c.rpn_train,
            )
            losses["loss_rpn_cls"] = loss_rpn_cls
            losses["loss_rpn_bbox"] = loss_rpn_bbox

            # proposals (no gradient through RPN outputs here, two_stage.py
            # treats proposal generation as a detached op)
            detached = [
                (jax.lax.stop_gradient(cm), jax.lax.stop_gradient(rm))
                for cm, rm in rpn_outs
            ]
            proposals = rpn_proposals_batched(
                detached, anchors, img_shapes, c.rpn_proposal_train
            )

        # RoI targets per image
        roi_keys = jax.random.split(k_roi, b)
        targets = jax.vmap(
            lambda k, pb, pv, gb, gl, gm: roi_targets_single(
                k,
                pb,
                pv,
                gb,
                gl,
                gm,
                c.rcnn_train,
                target_means=c.bbox_head.target_means,
                target_stds=c.bbox_head.target_stds,
            )
        )(
            roi_keys,
            proposals.boxes,
            proposals.valid,
            gt_boxes,
            gt_labels,
            gt_mask,
        )

        # RoIAlign over FPN levels + bbox head, batched over images
        cls_logits, bbox_deltas = self._bbox_forward(feats, targets.rois)

        s = c.rcnn_train.sampler.num
        flat = lambda x: x.reshape(b * s, *x.shape[2:])
        if c.bbox_head.use_gs:
            gs_losses = gs_loss(
                self.make_rng("sampling"),
                flat(cls_logits),
                flat(targets.labels),
                flat(targets.roi_valid),
                self.partition,
                c.bbox_head.gs.others_sample_ratio,
                class_weights=(
                    jnp.asarray(np.asarray(self.class_weights))
                    if self.class_weights is not None and c.bbox_head.loss_cls_type == "reweight"
                    else None
                ),
            )
            losses.update(gs_losses)
            # bbox regression identical to the plain head (gs_bbox_head_with0.py:173-186)
            losses["loss_bbox"] = bbox_reg_loss(
                flat(bbox_deltas),
                flat(targets.labels),
                flat(targets.bbox_targets),
                flat(targets.bbox_weights),
                reg_class_agnostic=c.bbox_head.reg_class_agnostic,
            )
        else:
            cw = (
                jnp.asarray(np.asarray(self.class_weights))
                if self.class_weights is not None
                else None
            )
            loss_cls, loss_bbox, acc = bbox_head_loss(
                flat(cls_logits),
                flat(bbox_deltas),
                flat(targets.labels),
                flat(targets.label_weights),
                flat(targets.bbox_targets),
                flat(targets.bbox_weights),
                reg_class_agnostic=c.bbox_head.reg_class_agnostic,
                loss_cls_type=c.bbox_head.loss_cls_type,
                class_weights=cw,
                focal_gamma=c.bbox_head.focal_gamma,
                focal_alpha=c.bbox_head.focal_alpha,
            )
            losses["loss_cls"] = loss_cls
            losses["loss_bbox"] = loss_bbox
            losses["acc"] = acc
        return losses, feats, targets

    def _mask_branch(self, feats, targets, gt_boxes, gt_mask_crops, losses):
        """Mask R-CNN branch (two_stage.py:238-262 parity). Adds loss_mask
        to `losses` and returns the intermediates a variant may consume
        (MaskScoringRCNN's mask-iou head needs the pooled feats, the
        selected-class logits, the targets, and the positive mask)."""
        c = self.cfg
        b = targets.rois.shape[0]
        s = c.rcnn_train.sampler.num
        # positives occupy the first S*pos_fraction slots by construction
        # (core/sampler.py top-k ordering) — pool only that prefix.
        mask_cap = max(int(s * c.rcnn_train.sampler.pos_fraction), 1)
        m_rois = targets.rois[:, :mask_cap]
        # mask branch pools at mask_size/2 (14 for 28x28 masks), the
        # reference's separate mask_roi_extractor (mask_rcnn configs)
        m_pooled = batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            m_rois,
            c.roi_extractor.featmap_strides,
            c.mask_head.mask_size // 2,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )
        m_labels = targets.labels[:, :mask_cap]
        if c.mask_head.class_agnostic:
            mask_logits = self.mask_head(m_pooled)  # (B, cap, 2S, 2S, 1)
        else:
            # selected-class logits (same gradients as the dense conv:
            # unselected channels carry zero cotangent)
            num_fg = c.mask_head.num_classes - 1
            mask_logits = self.mask_head(
                m_pooled, labels=jnp.clip(m_labels - 1, 0, num_fg - 1)
            )  # (B, cap, 2S, 2S)
        m_pos = (targets.labels[:, :mask_cap] > 0) & targets.roi_valid[:, :mask_cap]
        m_targets = jax.vmap(
            lambda rois, gb, gi, crops, pm: mask_target_single(
                rois, gb, gi, crops, pm, c.mask_head.mask_size
            )
        )(
            m_rois,
            gt_boxes,
            targets.pos_gt_inds[:, :mask_cap],
            gt_mask_crops,
            m_pos,
        )
        flat_m = lambda x: x.reshape(b * mask_cap, *x.shape[2:])
        losses["loss_mask"] = mask_head_loss(
            flat_m(mask_logits),
            flat_m(jax.lax.stop_gradient(m_targets)),
            flat_m(targets.labels[:, :mask_cap]),
            flat_m(m_pos),
            class_agnostic=c.mask_head.class_agnostic,
            preselected=not c.mask_head.class_agnostic,
        )
        return dict(
            m_rois=m_rois,
            m_pooled=m_pooled,
            mask_logits=mask_logits,
            m_targets=m_targets,
            m_labels=m_labels,
            m_pos=m_pos,
            mask_cap=mask_cap,
        )

    # --- inference -------------------------------------------------------
    def predict(
        self,
        images: jnp.ndarray,  # (B, H, W, 3)
        img_shapes: jnp.ndarray,  # (B, 2) content (h, w) in network scale
        scale_factors: jnp.ndarray,  # (B,) resize factor (network/original)
        rescale: bool = True,
    ) -> Detections:
        """simple_test parity (two_stage.py:267-290 + test_mixins.py:39-68)."""
        feats = self.extract_feats(images)
        return self._predict_feats(
            feats, images, img_shapes, scale_factors, rescale
        )

    def _predict_feats(
        self, feats, images, img_shapes, scale_factors, rescale=True,
        proposals=None,
    ) -> Detections:
        c = self.cfg
        if proposals is None:
            rpn_outs = self.rpn_head(feats)
            anchors = self._anchors(images)

            proposals = rpn_proposals_batched(
                rpn_outs, anchors, img_shapes, c.rpn_proposal_test
            )

        cls_logits, bbox_deltas = self._bbox_forward(feats, proposals.boxes)

        if c.bbox_head.use_gs:
            scores = jax.vmap(lambda lg: gs_merge_scores(lg, self.partition))(
                cls_logits
            )
        else:
            scores = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)

        def decode(rois, deltas, shape, sf):
            boxes = delta2bbox(
                rois,
                deltas.astype(jnp.float32),
                c.bbox_head.target_means,
                c.bbox_head.target_stds,
                max_shape=(shape[0], shape[1]),
            )
            return boxes / sf if rescale else boxes

        boxes = jax.vmap(decode)(
            proposals.boxes, bbox_deltas, img_shapes, scale_factors
        )
        db, ds, dl, dv = batched_multiclass_nms(
            boxes,
            scores,
            proposals.valid,
            c.rcnn_test.score_thr,
            c.rcnn_test.nms_iou_thr,
            c.rcnn_test.max_per_img,
            candidates_per_class=c.rcnn_test.nms_candidates_per_class,
            nms_type=c.rcnn_test.nms_type,
        )
        return Detections(boxes=db, scores=ds, labels=dl, valid=dv)

    def propose(
        self,
        images: jnp.ndarray,  # (B, H, W, 3)
        img_shapes: jnp.ndarray,  # (B, 2)
    ):
        """RPN proposals for one test view, in the VIEW frame.

        The per-view step of the reference's aug_test_rpn
        (test_mixins.py:21-36); the caller maps boxes back to the original
        frame and merges across views (merge_augs.py:8-45)."""
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
        """Score a FIXED proposal set against this view's features.

        The inner loop of the reference's aug_test_bboxes
        (test_mixins.py:139-165): pool the shared merged proposals on this
        view, run the bbox head, decode per-class boxes in the VIEW frame
        (rescale=False — the caller maps back and averages across views,
        merge_augs.py:46-70). Returns (boxes (B, P, C*4), scores (B, P, C)).
        """
        c = self.cfg
        feats = self.extract_feats(images)
        cls_logits, bbox_deltas = self._bbox_forward(feats, rois)
        if c.bbox_head.use_gs:
            scores = jax.vmap(lambda lg: gs_merge_scores(lg, self.partition))(
                cls_logits
            )
        else:
            scores = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)

        def decode(r, d, shape):
            return delta2bbox(
                r,
                d.astype(jnp.float32),
                c.bbox_head.target_means,
                c.bbox_head.target_stds,
                max_shape=(shape[0], shape[1]),
            )

        boxes = jax.vmap(decode)(rois, bbox_deltas, img_shapes)
        return boxes, scores

    def predict_masks(
        self,
        images: jnp.ndarray,  # (B, H, W, 3)
        det_boxes: jnp.ndarray,  # (B, M, 4) at ORIGINAL image scale
        det_labels: jnp.ndarray,  # (B, M) int32 0-based fg labels
        scale_factors: jnp.ndarray,  # (B,)
    ) -> jnp.ndarray:
        """(B, M, 2S, 2S) sigmoid mask probabilities of each detection's class.

        Parity: simple_test_mask (test_mixins.py:178) — detections rescaled
        back to network scale, pooled, mask head applied, per-label slice.
        """
        feats = self.extract_feats(images)
        return self._masks_feats(feats, det_boxes, det_labels, scale_factors)

    def predict_with_masks(
        self,
        images: jnp.ndarray,
        img_shapes: jnp.ndarray,
        scale_factors: jnp.ndarray,
        rescale: bool = True,
    ):
        """Detections + masks from ONE backbone pass.

        The reference's simple_test extracts features once and feeds both
        simple_test_bboxes and simple_test_mask (two_stage.py:267-290);
        running predict and predict_masks as separate graphs costs a
        second backbone+FPN evaluation (~40% of the step) and doubles the
        feats' HBM footprint.
        """
        feats = self.extract_feats(images)
        dets = self._predict_feats(
            feats, images, img_shapes, scale_factors, rescale
        )
        # _masks_feats pools rois at NETWORK scale: rescaled detections
        # (original-image coords) are scaled back up; with rescale=False
        # the boxes already sit at network scale, so the factor is 1.
        masks = self._masks_feats(
            feats,
            dets.boxes,
            dets.labels,
            scale_factors if rescale else jnp.ones_like(scale_factors),
        )
        return dets, masks

    def _masks_feats(self, feats, det_boxes, det_labels, scale_factors):
        c = self.cfg
        rois = det_boxes * scale_factors[:, None, None]
        pooled = batched_multilevel_roi_align(
            feats[: len(c.roi_extractor.featmap_strides)],
            rois,
            c.roi_extractor.featmap_strides,
            c.mask_head.mask_size // 2,
            c.roi_extractor.sample_num,
            c.roi_extractor.finest_scale,
        )
        if c.mask_head.class_agnostic:
            sel = self.mask_head(pooled)[..., 0]
        else:
            # class-selected logits: never materialize the (B, M, 2S, 2S,
            # num_fg) dense tensor (num_fg=1230 on LVIS)
            sel = self.mask_head(pooled, labels=det_labels)
        # sigmoid in f32, returned in the model dtype: serving fetches
        # (B, M, 2S, 2S) probabilities to host every step, and on bf16
        # models halving the bytes halves the transfer (the paste +
        # 0.5-threshold consumer is insensitive at bf16 resolution)
        return jax.nn.sigmoid(sel.astype(jnp.float32)).astype(self.dtype)


def build_detector(cfg: DetectorConfig, partition=None, dtype=jnp.float32) -> FasterRCNN:
    if cfg.bbox_head.use_gs and partition is None:
        raise ValueError("GS head requires a GSPartition")
    return FasterRCNN(cfg=cfg, partition=partition, dtype=dtype)


def build_model(cfg: DetectorConfig, partition=None, dtype=jnp.float32):
    """Config-dispatching constructor across the detector families —
    FasterRCNN/MaskRCNN, CascadeRCNN, HTC all share the loss/predict
    method interface, so CLIs and the inference API stay family-agnostic
    (the reference's build_detector registry dispatch,
    models/builder.py)."""
    if cfg.htc is not None:
        from .htc import build_htc

        return build_htc(cfg, partition=partition, dtype=dtype)
    if cfg.cascade is not None:
        from .cascade import build_cascade

        return build_cascade(cfg, partition=partition, dtype=dtype)
    if cfg.variant is not None:
        from .variants import build_variant

        return build_variant(cfg, partition=partition, dtype=dtype)
    return build_detector(cfg, partition=partition, dtype=dtype)

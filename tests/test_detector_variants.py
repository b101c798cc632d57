"""Detector-assembly variants (models/variants.py) end-to-end on tiny data.

Parity targets: /root/reference/mmdet/models/detectors/{fast_rcnn.py,
grid_rcnn.py, mask_scoring_rcnn.py, double_head_rcnn.py} — the four
assemblies the round-4 verdict flagged as heads-without-wiring.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balancedgroupsoftmax_tpu.config import (
    BBoxHeadConfig,
    DetectorConfig,
    MaskHeadConfig,
    ProposalConfig,
    RCNNTestConfig,
    RCNNTrainConfig,
    RoIExtractorConfig,
    SamplerConfig,
    VariantConfig,
)
from balancedgroupsoftmax_tpu.models.detector import build_model
from balancedgroupsoftmax_tpu.ops.mask import GT_MASK_CROP


def tiny_cfg(kind, mask=False, **vkw):
    return DetectorConfig(
        bbox_head=BBoxHeadConfig(num_classes=9, fc_out_channels=64),
        mask_head=MaskHeadConfig(num_classes=9) if mask else None,
        variant=VariantConfig(kind=kind, **vkw),
        rpn_proposal_train=ProposalConfig(nms_pre=128, nms_post=64, max_num=64),
        rpn_proposal_test=ProposalConfig(nms_pre=128, nms_post=64, max_num=64),
        rcnn_train=RCNNTrainConfig(sampler=SamplerConfig(num=32, pos_fraction=0.25)),
        rcnn_test=RCNNTestConfig(max_per_img=10),
        roi_extractor=RoIExtractorConfig(out_size=7),
        image_size=(128, 128),
        max_gt_boxes=8,
    )


def make_batch(b=2, g=8, mask=False):
    rng = np.random.RandomState(0)
    images = rng.randn(b, 128, 128, 3).astype(np.float32)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_labels = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), bool)
    for i in range(b):
        for j in range(3):
            x1, y1 = rng.uniform(0, 60, 2)
            w, h = rng.uniform(20, 50, 2)
            gt_boxes[i, j] = [x1, y1, min(x1 + w, 127), min(y1 + h, 127)]
            gt_labels[i, j] = rng.randint(1, 9)
            gt_mask[i, j] = True
    out = [
        jnp.asarray(images),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_mask),
        jnp.tile(jnp.asarray([[128.0, 128.0]], jnp.float32), (b, 1)),
    ]
    if mask:
        out.append(jnp.asarray(
            (rng.rand(b, g, GT_MASK_CROP, GT_MASK_CROP) > 0.4).astype(np.float32)
        ))
    return out


def synth_proposals(b=2, p=24, seed=3):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, 80, (b, p))
    y1 = rng.uniform(0, 80, (b, p))
    w = rng.uniform(10, 45, (b, p))
    h = rng.uniform(10, 45, (b, p))
    boxes = np.stack([x1, y1, np.minimum(x1 + w, 127), np.minimum(y1 + h, 127)], -1)
    return jnp.asarray(boxes, jnp.float32)


# ---------------------------------------------------------------- FastRCNN
def test_fast_rcnn_no_rpn_and_loss():
    cfg = tiny_cfg("fast")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    assert "rpn_head" not in variables["params"]  # fast_rcnn.py: no RPN

    batch = make_batch()
    props = synth_proposals()
    losses = model.apply(
        variables, *batch, proposals=props,
        method="loss", rngs={"sampling": jax.random.PRNGKey(1)},
    )
    assert "loss_rpn_cls" not in losses
    for k in ("loss_cls", "loss_bbox"):
        assert np.isfinite(float(losses[k])), k


def test_fast_rcnn_predict_with_proposals():
    cfg = tiny_cfg("fast")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    b = 2
    images, *_ = make_batch(b)
    props = synth_proposals(b)
    dets = model.apply(
        variables, images,
        jnp.tile(jnp.asarray([[128.0, 128.0]], jnp.float32), (b, 1)),
        jnp.ones((b,), jnp.float32),
        proposals=props,
        method="predict",
    )
    assert dets.boxes.shape == (b, 10, 4)
    assert np.isfinite(np.asarray(dets.boxes)).all()


# ---------------------------------------------------------------- GridRCNN
def test_grid_rcnn_loss_and_refined_predict():
    cfg = tiny_cfg("grid", grid_heatmap_size=28)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    assert "grid_head" in variables["params"]

    batch = make_batch()
    losses = model.apply(
        variables, *batch, method="loss", rngs={"sampling": jax.random.PRNGKey(1)}
    )
    assert np.isfinite(float(losses["loss_grid"]))
    assert float(losses["loss_grid"]) > 0

    b = 2
    dets = model.apply(
        variables, batch[0],
        jnp.tile(jnp.asarray([[128.0, 128.0]], jnp.float32), (b, 1)),
        jnp.ones((b,), jnp.float32),
        method="predict",
    )
    bx = np.asarray(dets.boxes)
    assert bx.shape == (b, 10, 4)
    assert np.isfinite(bx).all()
    # grid decode keeps boxes inside the image
    assert (bx >= 0).all() and (bx <= 127.0 + 1e-3).all()


# --------------------------------------------------------- MaskScoringRCNN
def test_mask_scoring_rcnn_loss_and_rescoring():
    cfg = tiny_cfg("mask_scoring", mask=True)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    assert "mask_iou_head" in variables["params"]

    batch = make_batch(mask=True)
    losses = model.apply(
        variables, *batch, method="loss", rngs={"sampling": jax.random.PRNGKey(1)}
    )
    assert np.isfinite(float(losses["loss_mask"]))
    assert np.isfinite(float(losses["loss_mask_iou"]))

    b = 2
    dets, masks, mask_scores = model.apply(
        variables, batch[0],
        jnp.tile(jnp.asarray([[128.0, 128.0]], jnp.float32), (b, 1)),
        jnp.ones((b,), jnp.float32),
        method="predict_with_masks",
    )
    assert masks.shape == (b, 10, 28, 28)
    assert mask_scores.shape == (b, 10)
    assert np.isfinite(np.asarray(mask_scores)).all()


# --------------------------------------------------------- DoubleHeadRCNN
def test_double_head_rcnn_loss_and_predict():
    cfg = tiny_cfg("double_head", reg_roi_scale_factor=1.3)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    bh = variables["params"]["bbox_head"]
    assert "res0_conv1" in bh and "fc0" in bh  # both branches exist

    batch = make_batch()
    losses = model.apply(
        variables, *batch, method="loss", rngs={"sampling": jax.random.PRNGKey(1)}
    )
    for k in ("loss_cls", "loss_bbox"):
        assert np.isfinite(float(losses[k])), k

    b = 2
    dets = model.apply(
        variables, batch[0],
        jnp.tile(jnp.asarray([[128.0, 128.0]], jnp.float32), (b, 1)),
        jnp.ones((b,), jnp.float32),
        method="predict",
    )
    assert dets.boxes.shape == (b, 10, 4)
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_double_head_reg_scale_changes_regression_only():
    """Inflating the reg-branch rois must change bbox deltas but not the
    classification logits (double_head_rcnn.py: fc branch pools plain
    rois)."""
    cfg13 = tiny_cfg("double_head", reg_roi_scale_factor=1.3)
    cfg10 = tiny_cfg("double_head", reg_roi_scale_factor=1.0)
    model13 = build_model(cfg13)
    model10 = build_model(cfg10)
    variables = model13.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))

    images, *_ = make_batch(1)
    rois = synth_proposals(1, p=8)

    def fwd(model, v):
        feats = model.apply(v, images[:1], method="extract_feats")
        return model.apply(
            v, feats, rois, method="_bbox_forward"
        )

    cls13, reg13 = fwd(model13, variables)
    cls10, reg10 = fwd(model10, variables)
    np.testing.assert_allclose(
        np.asarray(cls13), np.asarray(cls10), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(reg13), np.asarray(reg10), atol=1e-5)

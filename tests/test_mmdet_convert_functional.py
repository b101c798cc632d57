"""Functional validation of the mmdet checkpoint conversion.

Instantiates the reference's REAL torch modules (ResNet50, FPN, RPNHead,
SharedFCBBoxHead — /root/reference/mmdet/models/*, imported via
tests/reference_loader.load_reference_model_modules with their weight
inits executed for non-degenerate random parameters), assembles the full
two-stage state_dict under checkpoint naming (backbone.* / neck.* /
rpn_head.* / bbox_head.*), converts it with
utils.checkpoint.convert_mmdet_faster_rcnn, and asserts OUR flax model
reproduces the torch forward numerically at every stage:

  backbone+FPN features -> RPN cls/reg maps -> bbox head cls/reg logits.

This closes the round-1 gap where the converter was tested only against
a synthetically named state_dict (a shared misnaming could pass); here
the names and tensor layouts come from the actual reference modules.
"""

import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference_model_modules


@pytest.fixture(scope="module")
def ref():
    return load_reference_model_modules()


def _full_state_dict(bb, fpn, rpn, head):
    sd = {}
    for prefix, mod in (
        ("backbone", bb), ("neck", fpn), ("rpn_head", rpn), ("bbox_head", head)
    ):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
    return sd


def test_conversion_reproduces_reference_forward(ref):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from balancedgroupsoftmax_tpu import zoo
    from balancedgroupsoftmax_tpu.models.detector import build_detector
    from balancedgroupsoftmax_tpu.utils.checkpoint import (
        convert_mmdet_faster_rcnn,
    )

    torch.manual_seed(0)
    num_classes = 17
    bb = ref.ResNet(depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
                    frozen_stages=1, style="pytorch")
    fpn = ref.FPN(in_channels=[256, 512, 1024, 2048], out_channels=256,
                  num_outs=5)
    rpn = ref.RPNHead(
        in_channels=256, anchor_scales=[8], anchor_ratios=[0.5, 1.0, 2.0],
        anchor_strides=[4, 8, 16, 32, 64], target_means=[0, 0, 0, 0],
        target_stds=[1, 1, 1, 1],
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True),
        loss_bbox=dict(type="SmoothL1Loss"),
    )
    head = ref.SharedFCBBoxHead(
        num_fcs=2, in_channels=256, fc_out_channels=1024, roi_feat_size=7,
        num_classes=num_classes, target_means=[0, 0, 0, 0],
        target_stds=[0.1, 0.1, 0.2, 0.2], reg_class_agnostic=False,
        loss_cls=dict(type="CrossEntropyLoss"),
        loss_bbox=dict(type="SmoothL1Loss"),
    )
    # randomize BN running stats too — frozen-BN parity must use them
    for m in bb.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    bb.eval(), fpn.eval(), rpn.eval(), head.eval()

    sd = _full_state_dict(bb, fpn, rpn, head)
    params, stats = convert_mmdet_faster_rcnn(sd, depth=50)

    det_cfg, _ = zoo.faster_rcnn_r50_fpn_lvis(
        num_classes=num_classes, image_size=(64, 64)
    )
    model = build_detector(det_cfg, dtype=jnp.float32)
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        t_feats = fpn(bb(torch.from_numpy(x)))
        t_cls, t_reg = rpn(t_feats)
        pooled = rng.randn(6, 256, 7, 7).astype(np.float32)
        t_hcls, t_hreg = head(torch.from_numpy(pooled))

    j_feats = model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        method="extract_feats",
    )
    assert len(j_feats) == len(t_feats)
    for i, (jf, tf) in enumerate(zip(j_feats, t_feats)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(jf), (0, 3, 1, 2)), tf.numpy(),
            rtol=2e-3, atol=2e-4, err_msg=f"FPN level {i}",
        )

    j_outs = model.apply(variables, j_feats, method="rpn")
    for i, (j_cls_i, j_reg_i) in enumerate(j_outs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(j_cls_i), (0, 3, 1, 2)),
            t_cls[i].numpy(), rtol=2e-3, atol=2e-4, err_msg=f"rpn cls {i}",
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(j_reg_i), (0, 3, 1, 2)),
            t_reg[i].numpy(), rtol=2e-3, atol=2e-4, err_msg=f"rpn reg {i}",
        )

    j_hcls, j_hreg = model.apply(
        variables, jnp.asarray(np.transpose(pooled, (0, 2, 3, 1))),
        method="roi_head",
    )
    np.testing.assert_allclose(
        np.asarray(j_hcls), t_hcls.numpy(), rtol=2e-3, atol=2e-4,
        err_msg="bbox head cls (checks the NCHW->NHWC first-FC permute)",
    )
    np.testing.assert_allclose(
        np.asarray(j_hreg), t_hreg.numpy(), rtol=2e-3, atol=2e-4,
        err_msg="bbox head reg",
    )

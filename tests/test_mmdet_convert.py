"""Structural conversion test: a synthetic mmdet-style state_dict for a GS
Faster R-CNN (and a cascade + mask variant) converts into parameter trees
our models accept."""

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.utils.checkpoint import (
    convert_mmdet_faster_rcnn,
    warm_start,
)
from tests.test_checkpoint import _fake_torchvision_sd


def _fake_mmdet_sd(num_logits=14, cascade=False, mask=False):
    rng = np.random.RandomState(0)
    sd = {f"backbone.{k}": v for k, v in _fake_torchvision_sd().items()}
    for i in range(4):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = rng.randn(
            256, [256, 512, 1024, 2048][i], 1, 1
        ).astype(np.float32) * 0.05
        sd[f"neck.lateral_convs.{i}.conv.bias"] = np.zeros(256, np.float32)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = rng.randn(256, 256, 3, 3).astype(np.float32) * 0.05
        sd[f"neck.fpn_convs.{i}.conv.bias"] = np.zeros(256, np.float32)
    sd["rpn_head.rpn_conv.weight"] = rng.randn(256, 256, 3, 3).astype(np.float32) * 0.05
    sd["rpn_head.rpn_conv.bias"] = np.zeros(256, np.float32)
    sd["rpn_head.rpn_cls.weight"] = rng.randn(3, 256, 1, 1).astype(np.float32) * 0.05
    sd["rpn_head.rpn_cls.bias"] = np.zeros(3, np.float32)
    sd["rpn_head.rpn_reg.weight"] = rng.randn(12, 256, 1, 1).astype(np.float32) * 0.05
    sd["rpn_head.rpn_reg.bias"] = np.zeros(12, np.float32)

    def head(prefix, logits):
        sd[f"{prefix}.shared_fcs.0.weight"] = rng.randn(1024, 256 * 49).astype(np.float32) * 0.01
        sd[f"{prefix}.shared_fcs.0.bias"] = np.zeros(1024, np.float32)
        sd[f"{prefix}.shared_fcs.1.weight"] = rng.randn(1024, 1024).astype(np.float32) * 0.01
        sd[f"{prefix}.shared_fcs.1.bias"] = np.zeros(1024, np.float32)
        sd[f"{prefix}.fc_cls.weight"] = rng.randn(logits, 1024).astype(np.float32) * 0.01
        sd[f"{prefix}.fc_cls.bias"] = np.zeros(logits, np.float32)
        reg = 4 if cascade else 4 * 9
        sd[f"{prefix}.fc_reg.weight"] = rng.randn(reg, 1024).astype(np.float32) * 0.01
        sd[f"{prefix}.fc_reg.bias"] = np.zeros(reg, np.float32)

    if cascade:
        for i in range(3):
            head(f"bbox_head.{i}", num_logits)
    else:
        head("bbox_head", num_logits)

    def mask_head(prefix):
        for i in range(4):
            sd[f"{prefix}.convs.{i}.conv.weight"] = rng.randn(256, 256, 3, 3).astype(np.float32) * 0.01
            sd[f"{prefix}.convs.{i}.conv.bias"] = np.zeros(256, np.float32)
        sd[f"{prefix}.upsample.weight"] = rng.randn(256, 256, 2, 2).astype(np.float32) * 0.01
        sd[f"{prefix}.upsample.bias"] = np.zeros(256, np.float32)
        sd[f"{prefix}.conv_logits.weight"] = rng.randn(8, 256, 1, 1).astype(np.float32) * 0.01
        sd[f"{prefix}.conv_logits.bias"] = np.zeros(8, np.float32)

    if mask:
        mask_head("mask_head")
    return sd


def test_convert_gs_faster_rcnn_warm_starts_model():
    from balancedgroupsoftmax_tpu.models.detector import build_detector
    from tests.test_detector import tiny_config, tiny_partition

    sd = _fake_mmdet_sd(num_logits=14)  # 9 classes + 5 bins
    params, stats = convert_mmdet_faster_rcnn(sd)

    cfg = tiny_config(use_gs=True)
    import dataclasses

    # real-size head dims to match the converted fc weights
    cfg = dataclasses.replace(
        cfg, bbox_head=dataclasses.replace(cfg.bbox_head, fc_out_channels=1024)
    )
    model = build_detector(cfg, partition=tiny_partition())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    merged, copied, skipped = warm_start(variables["params"], params)
    # everything except nothing should copy (full structural match)
    assert len(copied) > 100
    names = " ".join(copied)
    assert "fc_cls" in names and "rpn_cls" in names and "lateral0" in names
    # converted batch stats structurally match
    s0 = stats["backbone"]["bn1"]["mean"]
    assert s0.shape == (64,)


def test_convert_cascade_and_mask_heads():
    sd = _fake_mmdet_sd(num_logits=14, cascade=True, mask=True)
    params, _ = convert_mmdet_faster_rcnn(sd)
    assert "bbox_head_0" in params and "bbox_head_2" in params
    assert params["bbox_head_1"]["fc_reg"]["kernel"].shape == (1024, 4)
    assert "mask_head" in params
    assert params["mask_head"]["upsample"]["kernel"].shape == (2, 2, 256, 256)
    assert params["mask_head"]["conv_logits"]["kernel"].shape == (1, 1, 256, 8)

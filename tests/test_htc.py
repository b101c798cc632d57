import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.config import CascadeConfig, HTCConfig, MaskHeadConfig
from balancedgroupsoftmax_tpu.models.htc import build_htc
from balancedgroupsoftmax_tpu.models.semantic_head import (
    resize_bilinear_align_corners,
    semantic_seg_loss,
)
from tests.test_detector import make_batch, tiny_config, tiny_partition


def htc_tiny(use_gs=False):
    cfg = tiny_config(use_gs=use_gs)
    return dataclasses.replace(
        cfg,
        cascade=CascadeConfig(),
        htc=HTCConfig(semantic_num_classes=12),
        mask_head=MaskHeadConfig(num_classes=9, conv_out_channels=32, num_convs=2),
    )


def test_resize_align_corners_matches_torch():
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 7, 9).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), size=(13, 5), mode="bilinear", align_corners=True
    ).numpy()
    got = resize_bilinear_align_corners(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), (13, 5)
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, atol=1e-5
    )


def test_semantic_seg_loss_ignore():
    logits = jnp.zeros((1, 4, 4, 5))
    labels = np.zeros((1, 4, 4), np.int32)
    labels[0, 0, :] = 255  # ignored row
    loss = semantic_seg_loss(logits, jnp.asarray(labels), 255, loss_weight=0.2)
    np.testing.assert_allclose(float(loss), 0.2 * np.log(5), rtol=1e-6)


def _mask_crops(b, g):
    crops = np.zeros((b, g, 112, 112), np.float32)
    crops[:, :, 10:100, 10:100] = 1.0
    return jnp.asarray(crops)


def test_htc_train_loss_all_branches():
    cfg = htc_tiny()
    model = build_htc(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    p = variables["params"]
    assert "semantic_head" in p
    assert "mask_head_0" in p and "mask_head_2" in p
    # info flow: stages 1,2 have conv_res, stage 0 does not
    assert "conv_res" not in p["mask_head_0"]
    assert "conv_res" in p["mask_head_1"]

    batch = make_batch()
    b, g = batch[1].shape[:2]
    seg = jnp.asarray(np.random.RandomState(0).randint(0, 12, (b, 16, 16)), jnp.int32)
    losses = jax.jit(
        lambda v, bt, cr, sg, k: model.apply(
            v, *bt, cr, sg, method="loss", rngs={"sampling": k}
        )
    )(variables, batch, _mask_crops(b, g), seg, jax.random.PRNGKey(1))
    expected = {"loss_rpn_cls", "loss_rpn_bbox", "loss_semantic_seg"}
    for i in range(3):
        expected |= {f"s{i}.loss_cls", f"s{i}.loss_bbox", f"s{i}.loss_mask"}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_htc_gs_predict_and_masks():
    cfg = htc_tiny(use_gs=True)
    model = build_htc(cfg, partition=tiny_partition())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch = make_batch()

    dets = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, jnp.ones(2), method="predict")
    )(variables, batch[0], batch[4])
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()

    probs = jax.jit(
        lambda v, im, db, dl, sf: model.apply(
            v, im, db, dl, sf, method="predict_masks"
        )
    )(variables, batch[0], dets.boxes, dets.labels, jnp.ones(2))
    assert probs.shape == (2, 10, 28, 28)
    pv = np.asarray(probs)
    assert ((pv >= 0) & (pv <= 1)).all()


def test_htc_propose_rescore():
    """HTC aug-rescore path: shapes, finiteness, and detection-box membership
    (rescore on propose's own proposals reproduces predict's candidates)."""
    cfg = htc_tiny(use_gs=True)
    model = build_htc(cfg, partition=tiny_partition())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch = make_batch()
    images, shapes = batch[0], batch[4]
    props = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, method="propose")
    )(variables, images, shapes)
    boxes, scores = jax.jit(
        lambda v, im, r, sh: model.apply(v, im, r, sh, method="rescore")
    )(variables, images, props.boxes, shapes)
    p = props.boxes.shape[1]
    assert boxes.shape == (images.shape[0], p, 4)
    assert scores.shape[:2] == (images.shape[0], p)
    assert np.isfinite(np.asarray(boxes)).all()

    dets = jax.jit(
        lambda v, im, sh: model.apply(
            v, im, sh, jnp.ones(images.shape[0]), method="predict"
        )
    )(variables, images, shapes)
    db, dv, bx = (np.asarray(dets.boxes), np.asarray(dets.valid), np.asarray(boxes))
    for b in range(images.shape[0]):
        for j in np.where(dv[b])[0]:
            d = np.abs(bx[b] - db[b, j][None]).max(axis=1)
            assert d.min() < 1e-4


def test_htc_predict_with_masks_matches_two_pass():
    """HTC's one-backbone-pass serving path == predict + predict_masks
    (reference simple_test computes feats/semantic once, htc.py:157-199)."""
    cfg = htc_tiny()
    model = build_htc(cfg)
    images, *_ = make_batch(b=1, size=cfg.image_size)
    images = jnp.asarray(images)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *cfg.image_size, 3))
    )
    shapes = jnp.asarray([[128.0, 128.0]])
    sfs = jnp.ones((1,), jnp.float32)
    dets = model.apply(variables, images, shapes, sfs, method="predict")
    masks = model.apply(
        variables, images, dets.boxes, dets.labels, sfs,
        method="predict_masks",
    )
    dets_f, masks_f = model.apply(
        variables, images, shapes, sfs, method="predict_with_masks"
    )
    np.testing.assert_allclose(
        np.asarray(dets_f.boxes), np.asarray(dets.boxes), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(masks_f), np.asarray(masks), rtol=1e-5, atol=1e-5
    )

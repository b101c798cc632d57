import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balancedgroupsoftmax_tpu.config import (
    AnchorConfig,
    BBoxHeadConfig,
    DetectorConfig,
    GSConfig,
    ProposalConfig,
    RCNNTestConfig,
    RCNNTrainConfig,
    SamplerConfig,
    RoIExtractorConfig,
)
from balancedgroupsoftmax_tpu.gs.partition import make_partition
from balancedgroupsoftmax_tpu.models.detector import build_detector


def tiny_config(use_gs=False, num_classes=9):
    return DetectorConfig(
        bbox_head=BBoxHeadConfig(
            num_classes=num_classes,
            use_gs=use_gs,
            fc_out_channels=64,
            gs=GSConfig(num_bins=5),
        ),
        rpn_proposal_train=ProposalConfig(nms_pre=128, nms_post=64, max_num=64),
        rpn_proposal_test=ProposalConfig(nms_pre=128, nms_post=64, max_num=64),
        rcnn_train=RCNNTrainConfig(sampler=SamplerConfig(num=32, pos_fraction=0.25)),
        rcnn_test=RCNNTestConfig(max_per_img=10),
        roi_extractor=RoIExtractorConfig(out_size=7),
        image_size=(128, 128),
        max_gt_boxes=8,
    )


def tiny_partition(num_classes=9):
    counts = np.array([0, 5, 50, 500, 5000, 7, 70, 700, 7000])[:num_classes]
    return make_partition(counts)


def make_batch(b=2, size=(128, 128), g=8):
    rng = np.random.RandomState(0)
    images = rng.randn(b, *size, 3).astype(np.float32)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_labels = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), bool)
    for i in range(b):
        n = 3
        for j in range(n):
            x1, y1 = rng.uniform(0, 60, 2)
            w, h = rng.uniform(20, 50, 2)
            gt_boxes[i, j] = [x1, y1, min(x1 + w, 127), min(y1 + h, 127)]
            gt_labels[i, j] = rng.randint(1, 9)
            gt_mask[i, j] = True
    img_shapes = np.tile(np.array([[128.0, 128.0]], np.float32), (b, 1))
    return (
        jnp.asarray(images),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_mask),
        jnp.asarray(img_shapes),
    )


@pytest.fixture(scope="module")
def plain_model_and_vars():
    cfg = tiny_config(use_gs=False)
    model = build_detector(cfg)
    images = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), images)
    return cfg, model, variables


def test_detector_init_param_shapes(plain_model_and_vars):
    cfg, model, variables = plain_model_and_vars
    params = variables["params"]
    assert "backbone" in params and "neck" in params
    # fc_cls: plain head -> num_classes logits
    assert params["bbox_head"]["fc_cls"]["kernel"].shape[-1] == 9
    assert params["bbox_head"]["fc_reg"]["kernel"].shape[-1] == 36


def test_detector_train_loss(plain_model_and_vars):
    cfg, model, variables = plain_model_and_vars
    batch = make_batch()

    @jax.jit
    def loss_fn(v, batch, key):
        losses = model.apply(
            v,
            *batch,
            method="loss",
            rngs={"sampling": key},
        )
        return losses

    losses = loss_fn(variables, batch, jax.random.PRNGKey(1))
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
        v = float(losses[k])
        assert np.isfinite(v) and v >= 0, (k, v)
    # classification loss should start near log(num_classes)
    assert 0.5 < float(losses["loss_cls"]) < 10


def test_detector_grads_finite(plain_model_and_vars):
    cfg, model, variables = plain_model_and_vars
    batch = make_batch()

    def total_loss(params):
        losses = model.apply(
            {**variables, "params": params},
            *batch,
            method="loss",
            rngs={"sampling": jax.random.PRNGKey(2)},
        )
        return sum(v for k, v in losses.items() if k.startswith("loss"))

    grads = jax.jit(jax.grad(total_loss))(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # some gradient must reach the backbone and heads
    gnorm = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert gnorm > 0


def test_detector_predict(plain_model_and_vars):
    cfg, model, variables = plain_model_and_vars
    batch = make_batch()
    dets = jax.jit(
        lambda v, im, sh: model.apply(
            v, im, sh, jnp.ones(im.shape[0]), method="predict"
        )
    )(variables, batch[0], batch[4])
    assert dets.boxes.shape == (2, 10, 4)
    assert dets.scores.shape == (2, 10)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    sc = np.asarray(dets.scores)
    assert (sc >= 0).all() and (sc <= 1).all()


def test_gs_detector_end_to_end():
    cfg = tiny_config(use_gs=True)
    p = tiny_partition()
    model = build_detector(cfg, partition=p)
    images = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), images)
    # fc_cls widened to num_classes + num_bins
    assert variables["params"]["bbox_head"]["fc_cls"]["kernel"].shape[-1] == 9 + 5

    batch = make_batch()
    losses = jax.jit(
        lambda v, b, k: model.apply(v, *b, method="loss", rngs={"sampling": k})
    )(variables, batch, jax.random.PRNGKey(3))
    for i in range(5):
        assert f"loss_cls_bin{i}" in losses
        assert np.isfinite(float(losses[f"loss_cls_bin{i}"]))
    assert np.isfinite(float(losses["loss_bbox"]))

    dets = jax.jit(
        lambda v, im, sh: model.apply(
            v, im, sh, jnp.ones(im.shape[0]), method="predict"
        )
    )(variables, batch[0], batch[4])
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()


def test_anchors_follow_batch_shape_not_config(plain_model_and_vars):
    """Portrait batches must get a portrait anchor grid. The pipeline emits
    two static buckets (landscape/portrait) into ONE model whose
    cfg.image_size matches only one of them; anchors built from the config
    default would silently TRANSPOSE for the other bucket (equal per-level
    counts, so nothing crashes — RPN targets are just wrong)."""
    _, model, variables = plain_model_and_vars
    anchors = model.apply(
        variables, jnp.zeros((1, 256, 128, 3)), method="_anchors"
    )
    from balancedgroupsoftmax_tpu.core.anchors import multilevel_anchors

    cfg = plain_model_and_vars[0]
    sizes = [(-(-256 // s), -(-128 // s)) for s in cfg.anchors.strides]
    want = np.concatenate(
        multilevel_anchors(
            sizes, cfg.anchors.strides, cfg.anchors.scales, cfg.anchors.ratios
        )
    )
    got = np.concatenate([np.asarray(x) for x in anchors])
    np.testing.assert_allclose(got, want, err_msg="anchor grid is transposed")

    # and a GT on the long side of a portrait batch must find positives
    images = jnp.asarray(np.random.RandomState(0).randn(1, 256, 128, 3),
                         jnp.float32)
    gt_boxes = jnp.asarray([[[30.0, 190.0, 90.0, 245.0]]])  # y beyond 128
    losses = jax.jit(
        lambda v, im, gb, k: model.apply(
            v, im, gb, jnp.ones((1, 1), jnp.int32), jnp.ones((1, 1), bool),
            jnp.asarray([[256.0, 128.0]]), method="loss",
            rngs={"sampling": k},
        )
    )(variables, images, gt_boxes, jax.random.PRNGKey(0))
    assert float(losses["loss_rpn_bbox"]) > 0, (
        "no positive anchors for a long-side GT — anchor grid is transposed"
    )


def test_predict_with_masks_matches_two_pass():
    """predict_with_masks (one backbone pass, the reference simple_test
    structure) must equal predict followed by predict_masks."""
    from balancedgroupsoftmax_tpu.config import MaskHeadConfig

    cfg = dataclasses.replace(
        tiny_config(),
        mask_head=MaskHeadConfig(
            num_classes=9, conv_out_channels=32, num_convs=2
        ),
    )
    model = build_detector(cfg)
    images, *_ = make_batch(b=2, size=cfg.image_size)
    images = jnp.asarray(images)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *cfg.image_size, 3)))
    shapes = jnp.asarray([[128.0, 128.0]] * 2)
    sfs = jnp.ones((2,), jnp.float32)

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
    np.testing.assert_array_equal(
        np.asarray(dets_f.labels), np.asarray(dets.labels)
    )
    np.testing.assert_allclose(
        np.asarray(masks_f), np.asarray(masks), rtol=1e-5, atol=1e-5
    )

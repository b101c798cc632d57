import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.gs.partition import class_weights_from_counts
from balancedgroupsoftmax_tpu.ops.losses import (
    balanced_l1,
    binary_cross_entropy_with_logits,
    ghm_c,
    iou_loss,
    sigmoid_focal_loss,
    smooth_l1,
    softmax_cross_entropy,
    weighted_softmax_cross_entropy_per_class,
)


def test_softmax_ce_matches_manual():
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 0.0, 0.0]])
    labels = jnp.asarray([0, 2])
    loss = softmax_cross_entropy(logits, labels)
    p0 = np.exp(2) / (np.exp(2) + 1 + np.exp(-1))
    expected = (-np.log(p0) - np.log(1 / 3)) / 2
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_weighted_and_avg_factor():
    logits = jnp.zeros((4, 5))
    labels = jnp.zeros(4, jnp.int32)
    w = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    loss = softmax_cross_entropy(logits, labels, weight=w, avg_factor=2.0)
    np.testing.assert_allclose(float(loss), np.log(5), rtol=1e-6)


def test_bce_matches_torch_formula():
    logits = jnp.asarray([-3.0, 0.0, 4.0])
    targets = jnp.asarray([0.0, 1.0, 1.0])
    loss = binary_cross_entropy_with_logits(logits, targets)
    expected = np.mean(
        [np.log1p(np.exp(-3)), np.log(2), np.log1p(np.exp(-4))]
    )
    np.testing.assert_allclose(float(loss), expected, rtol=1e-6)


def test_smooth_l1_regions():
    pred = jnp.asarray([0.0, 0.0])
    target = jnp.asarray([0.5, 3.0])
    loss = smooth_l1(pred, target, beta=1.0, avg_factor=1.0)
    np.testing.assert_allclose(float(loss), 0.5 * 0.25 + 2.5, rtol=1e-6)


def test_focal_loss_downweights_easy():
    logits = jnp.asarray([[10.0], [0.0]])  # easy positive, hard positive
    targets = jnp.asarray([[1.0], [1.0]])
    easy = float(sigmoid_focal_loss(logits[:1], targets[:1], avg_factor=1.0))
    hard = float(sigmoid_focal_loss(logits[1:], targets[1:], avg_factor=1.0))
    assert easy < hard * 1e-3


def test_reweight_ce():
    logits = jnp.zeros((2, 3))
    labels = jnp.asarray([1, 2])
    cw = jnp.asarray([1.0, 2.0, 0.5])
    loss = weighted_softmax_cross_entropy_per_class(
        logits, labels, cw, avg_factor=2.0
    )
    np.testing.assert_allclose(float(loss), np.log(3) * 2.5 / 2, rtol=1e-6)


def test_class_weights_formula():
    counts = np.array([0, 1, 10, 100, 100000])
    w = class_weights_from_counts(counts)
    assert w[0] == 1.0
    assert w.max() <= 5.0 and w.min() >= 0.1
    assert w[1] > w[2] > w[3]  # rarer -> larger weight
    assert w[4] == np.float32(0.1)  # clipped


def test_balanced_l1_and_iou_loss_finite():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    target = jnp.asarray(rng.randn(8, 4).astype(np.float32))
    assert np.isfinite(float(balanced_l1(pred, target, avg_factor=8.0)))

    boxes = jnp.asarray([[0, 0, 10, 10], [5, 5, 20, 20]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [6, 6, 21, 21]], jnp.float32)
    l = iou_loss(boxes, gts, avg_factor=2.0)
    assert float(l) > 0 and np.isfinite(float(l))
    perfect = iou_loss(boxes[:1], boxes[:1], avg_factor=1.0)
    np.testing.assert_allclose(float(perfect), 0.0, atol=1e-5)


def test_ghm_c_finite_and_harmonizing():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(64, 4).astype(np.float32))
    targets = jnp.asarray((rng.rand(64, 4) > 0.8).astype(np.float32))
    lw = jnp.ones((64, 4))
    loss = ghm_c(logits, targets, lw)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_focal_bbox_head_variant():
    import dataclasses

    import flax

    from balancedgroupsoftmax_tpu.models.detector import build_detector
    from tests.test_detector import make_batch, tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, bbox_head=dataclasses.replace(cfg.bbox_head, loss_cls_type="focal")
    )
    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch = make_batch()
    losses = jax.jit(
        lambda v, b, k: model.apply(v, *b, method="loss", rngs={"sampling": k})
    )(variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss_cls"]))

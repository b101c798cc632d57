import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.models.reppoints import (
    RepPoints,
    RepPointsConfig,
    points_to_boxes,
)


def test_points_to_boxes_minmax():
    # two points: (dy, dx) pairs interleaved
    pts = jnp.zeros((1, 18)).at[0, :4].set(jnp.asarray([-1.0, -2.0, 3.0, 4.0]))
    centers = jnp.asarray([[10.0, 20.0]])
    boxes = points_to_boxes(pts, centers, 2.0)
    # offsets scaled by stride 2: x in {10-4, 10+8, 10...}, y in {20-2, 20+6, 20}
    b = np.asarray(boxes[0])
    assert b[0] == 6.0 and b[2] == 18.0
    assert b[1] == 18.0 and b[3] == 26.0


def test_reppoints_loss_and_predict():
    cfg = RepPointsConfig(
        num_classes=9, image_size=(128, 128), nms_pre=64, max_per_img=10
    )
    m = RepPoints(cfg=cfg)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    g = 6
    gt_boxes = np.zeros((2, g, 4), np.float32)
    gt_boxes[:, 0] = [20, 20, 80, 90]
    gt_labels = np.zeros((2, g), np.int32)
    gt_labels[:, 0] = 3
    gt_mask = np.zeros((2, g), bool)
    gt_mask[:, 0] = True
    images = jnp.asarray(
        np.random.RandomState(0).randn(2, 128, 128, 3).astype(np.float32)
    )
    shapes = jnp.asarray([[128.0, 128.0]] * 2)
    losses = jax.jit(
        lambda v, im, b, l, mk, sh: m.apply(v, im, b, l, mk, sh, method="loss")
    )(v, images, jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_mask), shapes)
    for k in ("loss_cls", "loss_pts_init", "loss_pts_refine"):
        assert np.isfinite(float(losses[k])), k
    assert float(losses["loss_pts_init"]) > 0  # point assigner found positives

    dets = jax.jit(
        lambda v, im, sh: m.apply(v, im, sh, jnp.ones(2), method="predict")
    )(v, images, shapes)
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.boxes)).all()

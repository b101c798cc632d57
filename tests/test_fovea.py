import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.models.fovea import FoveaBox, FoveaConfig


def test_foveabox_loss_and_predict():
    cfg = FoveaConfig(
        num_classes=9, image_size=(128, 128), nms_pre=64, max_per_img=10,
        scale_ranges=((1, 32), (16, 64), (32, 128), (64, 256), (128, 2048)),
    )
    m = FoveaBox(cfg=cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    g = 6
    gt_boxes = np.zeros((2, g, 4), np.float32)
    gt_boxes[:, 0] = [20, 20, 100, 100]
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
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses["loss_bbox"]) > 0  # fovea positives assigned

    dets = jax.jit(
        lambda v, im, sh: m.apply(v, im, sh, jnp.ones(2), method="predict")
    )(v, images, shapes)
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()

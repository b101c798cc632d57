import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.models.ssd import SSD, SSDConfig, ssd_anchors


def test_ssd_geometry_and_losses():
    cfg = SSDConfig(num_classes=9, max_per_img=10)
    m = SSD(cfg=cfg)
    x = jnp.zeros((1, 300, 300, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o[0].shape[1] for o in outs] == [38, 19, 10, 5, 3, 1]  # SSD300

    anchors = ssd_anchors(cfg, [(o[0].shape[1], o[0].shape[2]) for o in outs])
    # level 0: 4 anchors/cell, levels 1-3: 6
    assert anchors[0].shape[0] == 38 * 38 * 4
    assert anchors[1].shape[0] == 19 * 19 * 6

    g = 4
    gt_boxes = np.zeros((2, g, 4), np.float32)
    gt_boxes[:, 0] = [30, 30, 120, 150]
    gt_labels = np.zeros((2, g), np.int32)
    gt_labels[:, 0] = 3
    gt_mask = np.zeros((2, g), bool)
    gt_mask[:, 0] = True
    images = jnp.asarray(
        np.random.RandomState(0).randn(2, 300, 300, 3).astype(np.float32)
    )
    losses = jax.jit(
        lambda v, im, b, l, mk: m.apply(v, im, b, l, mk, method="loss")
    )(v, images, jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_mask))
    assert all(np.isfinite(float(x)) for x in losses.values())

    dets = jax.jit(
        lambda v, im: m.apply(
            v, im, jnp.asarray([[300.0, 300.0]] * 2), jnp.ones(2), method="predict"
        )
    )(v, images)
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()

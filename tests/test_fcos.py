import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.models.fcos import FCOS, FCOSConfig
from tests.test_detector import make_batch


def tiny_fcos():
    return FCOSConfig(
        num_classes=9, image_size=(128, 128), nms_pre=64, max_per_img=10,
        regress_ranges=((-1, 32), (32, 64), (64, 128), (128, 256), (256, 1e8)),
    )


def test_fcos_loss_and_predict():
    model = FCOS(cfg=tiny_fcos())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch = make_batch()
    losses = jax.jit(lambda v, b: model.apply(v, *b, method="loss"))(variables, batch)
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(losses[k])), k

    dets = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, jnp.ones(2), method="predict")
    )(variables, batch[0], batch[4])
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_fcos_positive_points_assigned():
    """A large centered GT must produce positive points."""
    model = FCOS(cfg=tiny_fcos())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    g = 8
    gt_boxes = np.zeros((1, g, 4), np.float32)
    gt_boxes[0, 0] = [20, 20, 100, 100]
    gt_labels = np.zeros((1, g), np.int32)
    gt_labels[0, 0] = 3
    gt_mask = np.zeros((1, g), bool)
    gt_mask[0, 0] = True
    batch = (
        jnp.zeros((1, 128, 128, 3)),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_mask),
        jnp.asarray([[128.0, 128.0]]),
    )
    losses = model.apply(variables, *batch, method="loss")
    # bbox/centerness losses only exist when positives were assigned
    assert float(losses["loss_bbox"]) > 0
    assert float(losses["loss_centerness"]) > 0

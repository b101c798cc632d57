import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.config import ProposalConfig
from balancedgroupsoftmax_tpu.models.guided_anchor import (
    GAConfig,
    GARPN,
    ga_loc_targets,
)


def test_ga_loc_targets_regions():
    import numpy as np

    from balancedgroupsoftmax_tpu.models.fcos import _points

    cfg = GAConfig(strides=(4,), octave_base=8.0)
    points = jnp.asarray(_points(16, 16, 4))
    strides = jnp.full(256, 4.0)
    lvls = jnp.zeros(256, jnp.int32)
    gt = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])  # scale 33 -> level 0
    t = np.asarray(
        ga_loc_targets(points, strides, lvls, gt, jnp.asarray([True]), cfg)
    ).reshape(16, 16)
    # center region positive, ignore ring around it, far cells negative
    assert t[6, 6] == 1  # near gt center (24, 24) -> cell 6
    assert t[0, 0] == 0
    assert (t == -1).sum() > 0  # ignore ring exists
    assert (t == 1).sum() < (t >= 0).sum()


def test_garpn_loss_and_proposals():
    cfg = GAConfig(image_size=(128, 128))
    m = GARPN(cfg=cfg)
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
    for k in ("loss_loc", "loss_shape", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(losses[k])), k

    pc = ProposalConfig(nms_pre=128, nms_post=64, max_num=64)
    props = jax.jit(
        lambda v, im, sh: m.apply(v, im, sh, pc, method="propose")
    )(v, images, shapes)
    assert props.boxes.shape == (2, 64, 4)
    assert np.isfinite(np.asarray(props.boxes)).all()

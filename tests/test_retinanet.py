import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.models.retinanet import RetinaNet, RetinaNetConfig
from tests.test_detector import make_batch


def tiny_retina():
    return RetinaNetConfig(
        num_classes=9,
        image_size=(128, 128),
        nms_pre=64,
        max_per_img=10,
    )


def test_retinanet_loss_and_predict():
    cfg = tiny_retina()
    model = RetinaNet(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    # 9 anchors x 8 fg classes on the cls tower
    k = variables["params"]["bbox_head"]["retina_cls"]["kernel"]
    assert k.shape[-1] == 9 * 8

    batch = make_batch()
    losses = jax.jit(
        lambda v, b: model.apply(v, *b, method="loss")
    )(variables, batch)
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_bbox"]))
    # focal bias prior keeps initial cls loss small-ish
    assert float(losses["loss_cls"]) < 100

    dets = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, jnp.ones(2), method="predict")
    )(variables, batch[0], batch[4])
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()


def test_retinanet_gradients():
    cfg = tiny_retina()
    model = RetinaNet(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch = make_batch()

    def total(p):
        l = model.apply({**variables, "params": p}, *batch, method="loss")
        return l["loss_cls"] + l["loss_bbox"]

    g = jax.jit(jax.grad(total))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert sum(float(jnp.abs(x).sum()) for x in leaves) > 0

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.config import CascadeConfig
from balancedgroupsoftmax_tpu.models.cascade import build_cascade
from tests.test_detector import make_batch, tiny_config, tiny_partition


def cascade_tiny(use_gs=False):
    cfg = tiny_config(use_gs=use_gs)
    return dataclasses.replace(cfg, cascade=CascadeConfig())


def test_cascade_train_and_predict():
    cfg = cascade_tiny()
    model = build_cascade(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    params = variables["params"]
    assert "bbox_head_0" in params and "bbox_head_2" in params

    batch = make_batch()
    losses = jax.jit(
        lambda v, b, k: model.apply(v, *b, method="loss", rngs={"sampling": k})
    )(variables, batch, jax.random.PRNGKey(1))
    for i in range(3):
        assert np.isfinite(float(losses[f"s{i}.loss_cls"]))
        assert np.isfinite(float(losses[f"s{i}.loss_bbox"]))
    # stage loss weights decay
    assert float(losses["loss_rpn_cls"]) >= 0

    dets = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, jnp.ones(2), method="predict")
    )(variables, batch[0], batch[4])
    assert dets.boxes.shape == (2, 10, 4)
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_cascade_gs_variant():
    cfg = cascade_tiny(use_gs=True)
    model = build_cascade(cfg, partition=tiny_partition())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    # per-stage GS heads: widened fc_cls in each stage
    for i in range(3):
        k = variables["params"][f"bbox_head_{i}"]["fc_cls"]["kernel"]
        assert k.shape[-1] == 9 + 5

    batch = make_batch()
    losses = jax.jit(
        lambda v, b, k: model.apply(v, *b, method="loss", rngs={"sampling": k})
    )(variables, batch, jax.random.PRNGKey(2))
    assert "s0.loss_cls_bin0" in losses and "s2.loss_cls_bin4" in losses
    for v in losses.values():
        assert np.isfinite(float(v))

    dets = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, jnp.ones(2), method="predict")
    )(variables, batch[0], batch[4])
    sc = np.asarray(dets.scores)
    assert (sc >= 0).all() and (sc <= 1.0 + 1e-5).all()


def test_cascade_grads_reach_all_stages():
    cfg = cascade_tiny()
    model = build_cascade(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch = make_batch()

    def total(params):
        losses = model.apply(
            {**variables, "params": params}, *batch,
            method="loss", rngs={"sampling": jax.random.PRNGKey(3)},
        )
        return sum(v for k, v in losses.items() if "loss" in k)

    grads = jax.jit(jax.grad(total))(variables["params"])
    for i in range(3):
        g = grads[f"bbox_head_{i}"]["fc_cls"]["kernel"]
        assert float(jnp.abs(g).sum()) > 0, f"stage {i} got no gradient"

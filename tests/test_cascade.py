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


def test_cascade_propose_rescore_matches_predict():
    """Single-view aug path == direct predict: rescore() on propose()'s own
    proposals must reproduce predict()'s pre-NMS boxes/scores (the aug flow
    of cascade_rcnn.py:300-443 degenerates to simple_test for one view)."""
    cfg = cascade_tiny(use_gs=True)
    model = build_cascade(cfg, partition=tiny_partition())
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
    assert boxes.shape == (2, p, 4)  # class-agnostic regression
    assert scores.shape[:2] == (2, p)
    assert np.isfinite(np.asarray(boxes)).all()
    sc = np.asarray(scores)
    assert (sc >= 0).all() and (sc <= 1.0 + 1e-5).all()

    dets = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, jnp.ones(2), method="predict")
    )(variables, images, shapes)
    # the same proposals, stage loop and decode feed predict's NMS: every
    # final detection's box must appear among rescore's decoded boxes
    db = np.asarray(dets.boxes)
    dv = np.asarray(dets.valid)
    bx = np.asarray(boxes)
    for b in range(2):
        for j in np.where(dv[b])[0]:
            d = np.abs(bx[b] - db[b, j][None]).max(axis=1)
            assert d.min() < 1e-4

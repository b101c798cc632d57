"""Tiny-data convergence for the single-stage family (round-1 weak #3).

The shape/finiteness smoke tests can pass with broken target assignment
or sign-flipped losses; overfitting a 2-image fixture and demanding a
correct detection (right class, IoU > 0.5 with the GT) cannot. Covers
RetinaNet (anchor-based focal) and FCOS (anchor-free centerness) — the
two ends of the single-stage design space; the remaining heads share
their target machinery.

Distinct visual patterns per class (constant-color patches on a noise
background) make the fixture learnable by a small random-init network in
a few hundred SGD steps on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def make_learnable_batch(b=2, size=(128, 128)):
    """Two images, one box each, class encoded as a solid color patch."""
    rng = np.random.RandomState(3)
    images = rng.randn(b, *size, 3).astype(np.float32) * 0.1
    gt_boxes = np.zeros((b, 4, 4), np.float32)
    gt_labels = np.zeros((b, 4), np.int32)
    gt_mask = np.zeros((b, 4), bool)
    colors = {1: (2.0, -2.0, 0.0), 2: (-2.0, 2.0, 2.0)}
    for i in range(b):
        cls = i + 1
        x1, y1, s = 24 + 40 * i, 32, 48
        images[i, y1:y1 + s, x1:x1 + s] = colors[cls]
        gt_boxes[i, 0] = [x1, y1, x1 + s - 1, y1 + s - 1]
        gt_labels[i, 0] = cls
        gt_mask[i, 0] = True
    img_shapes = np.tile(np.asarray([list(size)], np.float32), (b, 1))
    return (
        jnp.asarray(images), jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), jnp.asarray(img_shapes),
    ), gt_boxes, gt_labels


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
    inter = ix * iy
    ar = lambda r: (r[2] - r[0] + 1) * (r[3] - r[1] + 1)
    return inter / (ar(a) + ar(b) - inter)


def _overfit_and_check(model, variables, batch, gt_boxes, gt_labels,
                       steps=400, lr=0.01):
    # the reference single-stage recipe's stabilizers, or from-scratch
    # focal training NaNs within 50 steps: grad clip + linear warmup
    sched = optax.linear_schedule(lr / 10, lr, 100)
    tx = optax.chain(
        optax.clip_by_global_norm(10.0), optax.sgd(sched, momentum=0.9)
    )
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            losses = model.apply({**variables, "params": p}, *batch,
                                 method="loss")
            return sum(jnp.sum(v) for v in losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    first = None
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert np.isfinite(final)
    assert final < 0.3 * first, f"loss did not converge: {first} -> {final}"

    dets = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, jnp.ones(im.shape[0]),
                                      method="predict")
    )({**variables, "params": params}, batch[0], batch[4])
    db, dl, dv = (np.asarray(dets.boxes), np.asarray(dets.labels),
                  np.asarray(dets.valid))
    ds = np.asarray(dets.scores)
    for i in range(batch[0].shape[0]):
        got = False
        for j in np.where(dv[i])[0]:
            # detection labels are 0-based foreground (eval/results.py
            # maps them through cat_ids); gt labels are 1-based
            if (dl[i, j] == gt_labels[i, 0] - 1
                    and _iou(db[i, j], gt_boxes[i, 0]) > 0.5
                    and ds[i, j] > 0.3):
                got = True
        assert got, (
            f"image {i}: no correct detection (want class {gt_labels[i, 0]} "
            f"at {gt_boxes[i, 0]}); got labels {dl[i][dv[i]]} "
            f"scores {ds[i][dv[i]]} boxes {db[i][dv[i]]}"
        )


@pytest.mark.slow
def test_retinanet_converges_on_tiny_data():
    from balancedgroupsoftmax_tpu.models.retinanet import (
        RetinaNet, RetinaNetConfig,
    )

    cfg = RetinaNetConfig(num_classes=3, image_size=(128, 128),
                          nms_pre=64, max_per_img=5)
    model = RetinaNet(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch, gt_boxes, gt_labels = make_learnable_batch()
    _overfit_and_check(model, variables, batch, gt_boxes, gt_labels)


@pytest.mark.slow
def test_fcos_converges_on_tiny_data():
    from balancedgroupsoftmax_tpu.models.fcos import FCOS, FCOSConfig

    cfg = FCOSConfig(num_classes=3, image_size=(128, 128),
                     nms_pre=64, max_per_img=5)
    model = FCOS(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch, gt_boxes, gt_labels = make_learnable_batch()
    _overfit_and_check(model, variables, batch, gt_boxes, gt_labels)

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


def make_learnable_batch(b=2, size=(128, 128), obj=48):
    """Two images, one box each, class encoded as a solid color patch."""
    rng = np.random.RandomState(3)
    images = rng.randn(b, *size, 3).astype(np.float32) * 0.1
    gt_boxes = np.zeros((b, 4, 4), np.float32)
    gt_labels = np.zeros((b, 4), np.int32)
    gt_mask = np.zeros((b, 4), bool)
    colors = {1: (2.0, -2.0, 0.0), 2: (-2.0, 2.0, 2.0)}
    for i in range(b):
        cls = i + 1
        x1, y1, s = size[1] // 5 + (size[1] // 3) * i, size[0] // 4, obj
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


def _overfit(model, variables, batch, steps=400, lr=0.01,
             loss_takes_shapes=True):
    """SGD-overfit the tiny batch; returns trained params.

    The reference single-stage recipe's stabilizers, or from-scratch
    focal training NaNs within 50 steps: grad clip + linear warmup."""
    sched = optax.linear_schedule(lr / 10, lr, 100)
    tx = optax.chain(
        optax.clip_by_global_norm(10.0), optax.sgd(sched, momentum=0.9)
    )
    opt_state = tx.init(variables["params"])
    loss_args = batch if loss_takes_shapes else batch[:4]

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            losses = model.apply({**variables, "params": p}, *loss_args,
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
    return params


def _overfit_and_check(model, variables, batch, gt_boxes, gt_labels,
                       steps=400, lr=0.01, loss_takes_shapes=True):
    params = _overfit(model, variables, batch, steps=steps, lr=lr,
                      loss_takes_shapes=loss_takes_shapes)

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


@pytest.mark.slow
def test_foveabox_converges_on_tiny_data():
    from balancedgroupsoftmax_tpu.models.fovea import FoveaBox, FoveaConfig

    # scale ranges shifted so the 48px fixture object is a positive at the
    # first two levels (the defaults assume 800x1333 inputs)
    cfg = FoveaConfig(
        num_classes=3, image_size=(128, 128), nms_pre=64, max_per_img=5,
        scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048)),
    )
    model = FoveaBox(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch, gt_boxes, gt_labels = make_learnable_batch()
    _overfit_and_check(model, variables, batch, gt_boxes, gt_labels)


@pytest.mark.slow
def test_reppoints_converges_on_tiny_data():
    from balancedgroupsoftmax_tpu.models.reppoints import (
        RepPoints, RepPointsConfig,
    )

    cfg = RepPointsConfig(num_classes=3, image_size=(128, 128),
                          nms_pre=64, max_per_img=5)
    model = RepPoints(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    batch, gt_boxes, gt_labels = make_learnable_batch()
    # 600 steps: the round-5 deform-conv boundary fix (corner clipping,
    # oracle-validated in test_deform_conv) shifted this head's tiny-data
    # trajectory enough that 400 steps landed a near-miss (right boxes,
    # wrong class); the longer schedule restores a robust margin
    _overfit_and_check(model, variables, batch, gt_boxes, gt_labels,
                       steps=600)


@pytest.mark.slow
def test_ssd_converges_on_tiny_data():
    from balancedgroupsoftmax_tpu.models.ssd import SSD, SSDConfig

    # SSDVGG's extra tower needs >= 288px inputs (the last two stride-1
    # valid convs eat 2px of feature map each); 288 -> maps 36/18/9/5/3/1
    size = (288, 288)
    cfg = SSDConfig(num_classes=3, input_size=288, max_per_img=5)
    model = SSD(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)))
    batch, gt_boxes, gt_labels = make_learnable_batch(size=size, obj=96)
    _overfit_and_check(model, variables, batch, gt_boxes, gt_labels,
                       steps=300, loss_takes_shapes=False)


@pytest.mark.slow
def test_garpn_converges_on_tiny_data():
    """GA-RPN is class-agnostic: convergence = the guided proposals recall
    the GT boxes (IoU > 0.5 in the top proposals) after overfitting."""
    from balancedgroupsoftmax_tpu.config import ProposalConfig
    from balancedgroupsoftmax_tpu.models.guided_anchor import GAConfig, GARPN

    cfg = GAConfig(image_size=(128, 128))
    model = GARPN(cfg=cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    batch, gt_boxes, gt_labels = make_learnable_batch()
    params = _overfit(model, variables, batch, steps=300)

    pc = ProposalConfig(nms_pre=256, nms_post=32, max_num=32)
    props = jax.jit(
        lambda v, im, sh: model.apply(v, im, sh, pc, method="propose")
    )({**variables, "params": params}, batch[0], batch[4])
    pb = np.asarray(props.boxes)
    pv = np.asarray(props.valid)
    ps = np.asarray(props.scores)
    order = np.argsort(-ps, axis=1)
    for i in range(pb.shape[0]):
        top = [j for j in order[i][:10] if pv[i, j]]
        best = max((_iou(pb[i, j], gt_boxes[i, 0]) for j in top), default=0.0)
        assert best > 0.5, (
            f"image {i}: no top-10 proposal overlaps GT {gt_boxes[i, 0]} "
            f"(best IoU {best:.3f}; boxes {pb[i, top]})"
        )

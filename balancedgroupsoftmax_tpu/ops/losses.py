"""Weighted detection losses.

Parity: /root/reference/mmdet/models/losses/cross_entropy_loss.py,
smooth_l1_loss.py, focal_loss.py and the weight/avg_factor reduction helpers
(losses/utils.py): `loss = sum(elementwise * weight) / avg_factor`.

All losses are elementwise jnp with explicit weights and avg_factor so that
padded slots contribute exactly zero — the static-shape equivalent of the
reference's variable-length tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_reduce(loss, weight=None, avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


def softmax_cross_entropy(logits, labels, weight=None, avg_factor=None):
    """CE over class dim (last). labels int (..., ), logits (..., C)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]
    return weight_reduce(nll, weight, avg_factor)


def binary_cross_entropy_with_logits(logits, targets, weight=None, avg_factor=None):
    """Sigmoid BCE; targets float in {0,1} (or soft)."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return weight_reduce(loss, weight, avg_factor)


def smooth_l1(pred, target, beta=1.0, weight=None, avg_factor=None):
    """Huber loss (smooth_l1_loss.py:8-15); weight broadcasts elementwise."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return weight_reduce(loss, weight, avg_factor)


def sigmoid_focal_loss(
    logits, targets, weight=None, gamma=2.0, alpha=0.25, avg_factor=None
):
    """Focal loss, numerically-stable form.

    Parity: mmdet/models/losses/focal_loss.py:10-21 (and the CUDA twin in
    mmdet/ops/sigmoid_focal_loss). `targets` is one-hot float of the same
    shape as logits.
    """
    p = jax.nn.sigmoid(logits)
    pt = jnp.where(targets > 0, 1 - p, p)
    focal_weight = (alpha * targets + (1 - alpha) * (1 - targets)) * pt**gamma
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_weight
    return weight_reduce(loss, weight, avg_factor)


def weighted_softmax_cross_entropy_per_class(
    logits, labels, class_weights, weight=None, avg_factor=None
):
    """CE with a per-class weight on each sample's target class.

    Parity: ReweightBBoxHead (reweight_bbox_head.py:27-55) — the `cls_weight`
    file becomes a (C,) array; sample weight *= class_weights[label].
    """
    cw = class_weights[labels]
    w = cw if weight is None else weight * cw
    return softmax_cross_entropy(logits, labels, weight=w, avg_factor=avg_factor)


def balanced_l1(pred, target, beta=1.0, alpha=0.5, gamma=1.5, weight=None, avg_factor=None):
    """Balanced L1 (Libra R-CNN; losses/balanced_l1_loss.py parity)."""
    diff = jnp.abs(pred - target)
    b = jnp.exp(gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta,
    )
    return weight_reduce(loss, weight, avg_factor)


def iou_loss(pred_boxes, target_boxes, weight=None, avg_factor=None, eps=1e-6):
    """-log(IoU) loss (losses/iou_loss.py parity, +1 convention)."""
    from .boxes import bbox_overlaps

    ious = bbox_overlaps(pred_boxes, target_boxes, is_aligned=True)
    loss = -jnp.log(jnp.clip(ious, eps, None))
    return weight_reduce(loss, weight, avg_factor)


def _ghm_weights(g, valid, edges, bins, acc_sum, momentum, tot):
    """Gradient-density weights shared by GHM-C/R (losses/ghm_loss.py:66-91,
    143-163): per-bin inverse-density weight, normalized by the count of
    NON-EMPTY bins n (not the static bin count), with the optional running
    EMA of per-bin populations (acc_sum, updated only for non-empty bins —
    the reference mutates self.acc_sum inside `if num_in_bin > 0`).

    Returns (weights, new_acc_sum). Stateless/jit-friendly: the caller
    threads acc_sum through the train step (a flax variable or TrainState
    leaf) instead of the reference's module attribute. `tot` is the
    caller's normalizer — GHM-C uses the valid COUNT, GHM-R the label
    weight SUM (ghm_loss.py:73 vs :147) — and scales the per-bin weights.
    """
    weights = jnp.zeros_like(g)
    n = jnp.zeros((), g.dtype)
    new_acc = []
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num = jnp.sum(inds).astype(g.dtype)
        nonempty = num > 0
        if momentum > 0:
            acc_i = jnp.where(
                nonempty, momentum * acc_sum[i] + (1 - momentum) * num, acc_sum[i]
            )
            new_acc.append(acc_i)
            denom = acc_i
        else:
            denom = num
        weights = jnp.where(
            inds & nonempty, tot / jnp.maximum(denom, 1e-12), weights
        )
        n = n + nonempty.astype(g.dtype)
    weights = weights / jnp.maximum(n, 1.0)
    return weights, (jnp.stack(new_acc) if momentum > 0 else acc_sum)


def ghm_c(logits, targets, label_weight, bins=10, momentum=0.0,
          avg_factor=None, acc_sum=None):
    """GHM classification loss (losses/ghm_loss.py GHMC parity).

    Gradient-density harmonizing on sigmoid logits; `targets` one-hot float.
    momentum=0 (shipped-config default) is stateless and returns the loss;
    momentum>0 is the reference's running-EMA variant — pass the (bins,)
    `acc_sum` state and the call returns (loss, new_acc_sum) for the caller
    to thread (ghm_loss.py:80-84 mutates self.acc_sum in place).
    """
    g = jnp.abs(jax.nn.sigmoid(logits) - targets)
    valid = label_weight > 0
    tot = jnp.maximum(jnp.sum(valid).astype(g.dtype), 1.0)
    edges = jnp.linspace(0, 1, bins + 1).at[-1].add(1e-6)
    if momentum > 0 and acc_sum is None:
        acc_sum = jnp.zeros((bins,), g.dtype)
    weights, new_acc = _ghm_weights(g, valid, edges, bins, acc_sum, momentum, tot)
    bce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = jnp.sum(bce * weights) / (avg_factor or tot)
    return (loss, new_acc) if momentum > 0 else loss


def ghm_r(pred, target, label_weight, mu=0.02, bins=10, momentum=0.0,
          avg_factor=None, acc_sum=None):
    """GHM regression loss (GHMR parity): ASL1 base with density weights;
    momentum>0 returns (loss, new_acc_sum) like ghm_c."""
    diff = pred - target
    loss = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff))
    valid = label_weight > 0
    # the reference normalizes GHM-R by sum(label_weight), not the valid
    # count (ghm_loss.py:147 tot = label_weight.float().sum()) — and uses
    # the same tot inside the per-bin weights
    tot = jnp.maximum(jnp.sum(label_weight.astype(g.dtype)), 1.0)
    edges = jnp.linspace(0, 1, bins + 1).at[-1].set(1e3)
    if momentum > 0 and acc_sum is None:
        acc_sum = jnp.zeros((bins,), g.dtype)
    weights, new_acc = _ghm_weights(g, valid, edges, bins, acc_sum, momentum, tot)
    out = jnp.sum(loss * weights) / (avg_factor or tot)
    return (out, new_acc) if momentum > 0 else out


def accuracy(logits, labels, mask=None):
    """Top-1 accuracy over valid entries (losses/accuracy.py parity)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return correct.mean()

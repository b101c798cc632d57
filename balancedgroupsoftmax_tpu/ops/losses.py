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


def accuracy(logits, labels, mask=None):
    """Top-1 accuracy over valid entries (losses/accuracy.py parity)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return correct.mean()

"""Shared-FC bbox head (plain softmax and grouped-softmax variants).

Parity: /root/reference/mmdet/models/bbox_heads/convfc_bbox_head.py
(SharedFCBBoxHead: 2 shared FCs -> fc_cls + fc_reg) and bbox_head.py
(loss :98-131, get_det_bboxes :132-168). The GS variant widens fc_cls to
num_classes + num_bins logits (gs_bbox_head_with0.py:28-29); its loss and
score merging live in gs/head.py as pure functions.

The RoI feature tensor enters as (R, roi, roi, C) NHWC; flattening uses the
same (C-last) order for checkpoint conversion consistency (converted
torchvision/mmdet weights are permuted accordingly in utils/checkpoint.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import BBoxHeadConfig
from ..ops.losses import accuracy, smooth_l1, softmax_cross_entropy


class SharedFCBBoxHead(nn.Module):
    cfg: BBoxHeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, roi_feats: jnp.ndarray, return_feature: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """roi_feats (..., S, S, C) -> (cls_logits (..., L), bbox_deltas (..., 4K)).

        With return_feature=True also returns the pre-classifier feature —
        the DCM (nearest-class-mean) hook (DCM_bbox_head.py:27-49 parity).
        """
        c = self.cfg
        x = roi_feats.reshape(*roi_feats.shape[:-3], -1)
        for i in range(c.num_shared_fcs):
            x = nn.Dense(
                c.fc_out_channels,
                dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"shared_fc{i}",
            )(x)
            x = nn.relu(x)
        feature = x
        num_logits = c.num_classes + (c.gs.num_bins if c.use_gs else 0)
        cls_logits = nn.Dense(
            num_logits,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="fc_cls",
        )(x)
        reg_dim = 4 if c.reg_class_agnostic else 4 * c.num_classes
        bbox_deltas = nn.Dense(
            reg_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="fc_reg",
        )(x)
        if return_feature:
            return cls_logits, bbox_deltas, feature
        return cls_logits, bbox_deltas


def bbox_reg_loss(
    bbox_deltas: jnp.ndarray,  # (N, 4C) or (N, 4)
    labels: jnp.ndarray,  # (N,) int32
    bbox_targets: jnp.ndarray,  # (N, 4)
    bbox_weights: jnp.ndarray,  # (N, 4)
    reg_class_agnostic: bool = False,
    beta: float = 1.0,
) -> jnp.ndarray:
    """Smooth-L1 on the target-class delta slice (bbox_head.py:113-131)."""
    n = bbox_deltas.shape[0]
    if reg_class_agnostic:
        pos_deltas = bbox_deltas.astype(jnp.float32)
    else:
        d = bbox_deltas.astype(jnp.float32).reshape(n, -1, 4)
        pos_deltas = jnp.take_along_axis(
            d, jnp.clip(labels, 0, d.shape[1] - 1)[:, None, None], axis=1
        )[:, 0]
    return smooth_l1(
        pos_deltas, bbox_targets, beta=beta, weight=bbox_weights, avg_factor=n
    )


def bbox_head_loss(
    cls_logits: jnp.ndarray,  # (N, C)
    bbox_deltas: jnp.ndarray,  # (N, 4C) or (N, 4)
    labels: jnp.ndarray,  # (N,) int32
    label_weights: jnp.ndarray,  # (N,)
    bbox_targets: jnp.ndarray,  # (N, 4)
    bbox_weights: jnp.ndarray,  # (N, 4)
    reg_class_agnostic: bool = False,
    beta: float = 1.0,
    loss_cls_type: str = "softmax",
    class_weights: jnp.ndarray | None = None,
    focal_gamma: float = 2.0,
    focal_alpha: float = 0.25,
):
    """Classification + smooth-L1 regression (bbox_head.py:98-131 parity).

    loss_cls_type selects the reference variants: 'softmax' (default CE),
    'focal' (transferred/*focalloss* configs — sigmoid focal over all
    logits with one-hot targets), 'reweight' (ReweightBBoxHead per-class CE
    weights from the cls_weight file, reweight_bbox_head.py:27-55).
    avg factors: CE by count of weighted rois; bbox by total roi count
    (bbox_head.py:110,126 — avg_factor=bbox_targets.size(0)).
    """
    from ..ops.losses import sigmoid_focal_loss, weighted_softmax_cross_entropy_per_class

    n = cls_logits.shape[0]
    avg_cls = jnp.maximum(jnp.sum(label_weights > 0), 1.0)
    logits32 = cls_logits.astype(jnp.float32)
    if loss_cls_type == "focal":
        onehot = jax.nn.one_hot(labels, logits32.shape[-1], dtype=jnp.float32)
        loss_cls = sigmoid_focal_loss(
            logits32,
            onehot,
            weight=label_weights[:, None],
            gamma=focal_gamma,
            alpha=focal_alpha,
            avg_factor=avg_cls,
        )
    elif loss_cls_type == "reweight":
        assert class_weights is not None
        loss_cls = weighted_softmax_cross_entropy_per_class(
            logits32, labels, class_weights, weight=label_weights, avg_factor=avg_cls
        )
    else:
        loss_cls = softmax_cross_entropy(
            logits32, labels, weight=label_weights, avg_factor=avg_cls
        )
    loss_bbox = bbox_reg_loss(
        bbox_deltas, labels, bbox_targets, bbox_weights, reg_class_agnostic, beta
    )
    acc = accuracy(cls_logits, labels, mask=(label_weights > 0).astype(jnp.float32))
    return loss_cls, loss_bbox, acc

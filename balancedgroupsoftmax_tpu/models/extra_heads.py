"""Additional heads/necks from the reference model zoo.

Parity:
- DoubleConvFCBBoxHead (mmdet/models/bbox_heads/double_bbox_head.py):
  conv branch (residual bottlenecks -> global avg pool -> fc_reg) + fc
  branch (2 FCs -> fc_cls) — the Double-Head R-CNN head.
- MaskIoUHead (mmdet/models/mask_heads/maskiou_head.py): predicts the IoU
  of the predicted mask with GT (Mask Scoring R-CNN); at test time the
  class score is multiplied by the predicted mask IoU.
- BFP (mmdet/models/necks/bfp.py, Libra R-CNN): gather all FPN levels at
  the refine level, average, refine, scatter the residual back.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import upsample_nearest_2x
from .plugins import NonLocal2D
from .semantic_head import resize_bilinear_align_corners


class ResLayerSharedHead(nn.Module):
    """ResNet stage-5 as a shared RoI head (shared_heads/res_layer.py).

    Used by C4-style detectors: RoI features (S, S, 1024) run through the
    three stage-4 bottlenecks (stride 1 here — RoI features are already
    pooled) and global-average-pool for the classifier."""

    num_blocks: int = 3
    planes: int = 512  # -> 2048 output channels
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        from .resnet import Bottleneck

        x = roi_feats
        for b in range(self.num_blocks):
            x = Bottleneck(
                planes=self.planes, stride=2 if b == 0 else 1, dtype=self.dtype,
                name=f"layer4_block{b}",
            )(x)
        return x


class DoubleConvFCBBoxHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray, reg_feats: jnp.ndarray = None):
        """roi_feats (..., S, S, C) -> (cls_logits, bbox_deltas).

        `reg_feats` feeds the conv/regression branch when given — the
        DoubleHeadRCNN assembly pools it from rois inflated by
        reg_roi_scale_factor (double_head_rcnn.py forward_train) while the
        fc/classification branch keeps the unscaled pooling."""
        if reg_feats is None:
            reg_feats = roi_feats
        # conv branch -> regression
        x = nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype, name="res_in")(
            reg_feats
        )
        for i in range(self.num_convs):
            res = x
            y = nn.Conv(
                self.conv_out_channels // 4, (1, 1), dtype=self.dtype,
                name=f"res{i}_conv1",
            )(x)
            y = nn.relu(y)
            y = nn.Conv(
                self.conv_out_channels // 4, (3, 3), padding=[(1, 1)] * 2,
                dtype=self.dtype, name=f"res{i}_conv2",
            )(y)
            y = nn.relu(y)
            y = nn.Conv(
                self.conv_out_channels, (1, 1), dtype=self.dtype, name=f"res{i}_conv3"
            )(y)
            x = nn.relu(res + y)
        pooled = x.mean(axis=(-3, -2))  # global average pool
        reg_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_deltas = nn.Dense(
            reg_dim, kernel_init=nn.initializers.normal(0.001), dtype=self.dtype,
            name="fc_reg",
        )(pooled)

        # fc branch -> classification
        z = roi_feats.reshape(*roi_feats.shape[:-3], -1)
        for i in range(self.num_fcs):
            z = nn.Dense(self.fc_out_channels, dtype=self.dtype, name=f"fc{i}")(z)
            z = nn.relu(z)
        cls_logits = nn.Dense(
            self.num_classes, kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="fc_cls",
        )(z)
        return cls_logits, bbox_deltas


class MaskIoUHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mask_feats: jnp.ndarray, mask_pred: jnp.ndarray):
        """mask_feats (..., S, S, C), mask_pred (..., 2S, 2S) sigmoid probs
        of the target class -> per-class mask IoU logits (..., num_fg)."""
        # downsample mask pred to feat size and concat as a channel
        s = mask_feats.shape[-3]
        mp = mask_pred[..., None]
        mp = nn.max_pool(mp, (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feats, mp.astype(mask_feats.dtype)], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.Conv(
                self.conv_out_channels, (3, 3), strides=(stride, stride),
                padding=[(1, 1)] * 2, dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        x = x.reshape(*x.shape[:-3], -1)
        for i in range(self.num_fcs):
            x = nn.Dense(self.fc_out_channels, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.num_classes - 1, dtype=self.dtype, name="fc_mask_iou")(x)


def mask_iou_target(
    mask_pred: jnp.ndarray,  # (N, M, M) binarized predicted masks
    mask_targets: jnp.ndarray,  # (N, M, M) gt masks
    full_areas: jnp.ndarray,  # (N,) gt mask area / proposal-crop area ratio
) -> jnp.ndarray:
    """MaskIoU regression target (maskiou_head.py get_target): IoU between
    the predicted (thresholded) mask and GT within the proposal, corrected
    by the GT area outside the proposal."""
    pred = (mask_pred > 0.5).astype(jnp.float32)
    inter = (pred * mask_targets).sum(axis=(-2, -1))
    pred_area = pred.sum(axis=(-2, -1))
    gt_in = mask_targets.sum(axis=(-2, -1))
    gt_full = gt_in / jnp.clip(full_areas, 1e-6, 1.0)
    union = pred_area + gt_full - inter
    return inter / jnp.maximum(union, 1.0)


class BFP(nn.Module):
    """Balanced Feature Pyramid (Libra R-CNN)."""

    refine_level: int = 2
    refine_type: str = "non_local"  # 'non_local' | 'conv' | 'none'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        num = len(feats)
        size = (feats[self.refine_level].shape[-3], feats[self.refine_level].shape[-2])
        gathered = []
        for i, f in enumerate(feats):
            if i < self.refine_level:
                # downsample via strided max pool to the refine size
                while (f.shape[-3], f.shape[-2]) != size:
                    f = nn.max_pool(f, (2, 2), strides=(2, 2))
            elif i > self.refine_level:
                f = resize_bilinear_align_corners(f, size)
            gathered.append(f)
        bsf = sum(gathered) / num
        if self.refine_type == "non_local":
            bsf = NonLocal2D(dtype=self.dtype, name="refine")(bsf)
        elif self.refine_type == "conv":
            bsf = nn.Conv(
                bsf.shape[-1], (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                name="refine",
            )(bsf)
        outs = []
        for i, f in enumerate(feats):
            r = bsf
            if i < self.refine_level:
                r = resize_bilinear_align_corners(r, (f.shape[-3], f.shape[-2]))
            elif i > self.refine_level:
                while (r.shape[-3], r.shape[-2]) != (f.shape[-3], f.shape[-2]):
                    r = nn.max_pool(r, (2, 2), strides=(2, 2))
            outs.append(f + r)
        return tuple(outs)

"""Fused semantic segmentation head (HTC stuff-thing branch).

Parity: /root/reference/mmdet/models/mask_heads/fused_semantic_head.py —
per-level 1x1 laterals, bilinear (align_corners=True) resize to the fusion
level, sum, 4 3x3 convs, then a 1x1 embedding feature and 1x1 183-class
logits; loss = pixel CE with ignore_label 255 scaled by 0.2 (:100-106).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def resize_bilinear_align_corners(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """(..., H, W, C) -> (..., h, w, C), torch align_corners=True semantics."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x

    def coords(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.zeros(n_out)
        return jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))

    ys = coords(h_in, h_out)
    xs = coords(w_in, w_out)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h_in - 1)
    y1 = jnp.clip(y0 + 1, 0, h_in - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w_in - 1)
    x1 = jnp.clip(x0 + 1, 0, w_in - 1)
    wy = (ys - y0)[..., :, None, None]
    wx = (xs - x0)[..., None, :, None]

    r0 = x[..., y0, :, :]
    r1 = x[..., y1, :, :]
    v00 = r0[..., :, x0, :]
    v01 = r0[..., :, x1, :]
    v10 = r1[..., :, x0, :]
    v11 = r1[..., :, x1, :]
    wy = wy.astype(x.dtype)
    wx = wx.astype(x.dtype)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


class FusedSemanticHead(nn.Module):
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    conv_out_channels: int = 256
    num_classes: int = 183
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: per-level (..., H_l, W_l, C). Returns (seg_logits, feature)
        at the fusion level's resolution."""
        laterals = [
            nn.Conv(self.conv_out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")
            for i in range(self.num_ins)
        ]
        x = nn.relu(laterals[self.fusion_level](feats[self.fusion_level]))
        size = (x.shape[-3], x.shape[-2])
        for i, f in enumerate(feats):
            if i == self.fusion_level:
                continue
            y = nn.relu(laterals[i](f))
            x = x + resize_bilinear_align_corners(y, size)
        for i in range(self.num_convs):
            x = nn.Conv(
                self.conv_out_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        seg_logits = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="conv_logits"
        )(x)
        feature = nn.relu(
            nn.Conv(
                self.conv_out_channels, (1, 1), dtype=self.dtype, name="conv_embedding"
            )(x)
        )
        return seg_logits, feature


def semantic_seg_loss(
    seg_logits: jnp.ndarray,  # (..., H, W, C)
    labels: jnp.ndarray,  # (..., H, W) int32, ignore_label skipped
    ignore_label: int = 255,
    loss_weight: float = 0.2,
) -> jnp.ndarray:
    logits = seg_logits.astype(jnp.float32)
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None].astype(jnp.int32), axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return loss_weight * jnp.sum(jnp.where(valid, nll, 0.0)) / denom

"""Grid head (Grid R-CNN) — grid-point localization replacing box regression.

Parity: /root/reference/mmdet/models/mask_heads/grid_head.py — RoI features
-> conv stack -> deconvs -> per-point heatmaps for a 3x3 grid of box
keypoints; training supervises gaussian point targets with BCE; at test the
argmax of each heatmap maps grid points back to image coordinates and the
box is re-estimated from opposing point pairs (grid_head.py get_bboxes).
The reference's second-order point fusion convs are included.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

GRID_POINTS = 9  # 3x3


class GridHead(nn.Module):
    num_convs: int = 8
    conv_channels: int = 64
    heatmap_size: int = 56
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        """(N, S, S, C) roi feats -> (N, hm, hm, 9) point heatmap logits."""
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.GroupNorm(num_groups=8, dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.relu(x)
        # point-specific branches with neighbor fusion (grid_head.py fusion)
        points = [
            nn.Conv(self.conv_channels // 2, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"point{i}")(x)
            for i in range(GRID_POINTS)
        ]
        fused = []
        for i in range(GRID_POINTS):
            r, c = divmod(i, 3)
            acc = points[i]
            for j in range(GRID_POINTS):
                rj, cj = divmod(j, 3)
                if abs(r - rj) + abs(c - cj) == 1:  # 4-neighbors
                    acc = acc + nn.Conv(
                        self.conv_channels // 2, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"fuse{i}_{j}",
                    )(points[j])
            fused.append(nn.relu(acc))
        # upsample x4 to the heatmap size and predict one channel per point
        outs = []
        for i, f in enumerate(fused):
            y = nn.ConvTranspose(self.conv_channels // 2, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name=f"up1_{i}")(f)
            y = nn.relu(y)
            y = nn.ConvTranspose(1, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name=f"up2_{i}")(y)
            outs.append(y[..., 0])
        return jnp.stack(outs, axis=-1)


def grid_targets(
    rois: jnp.ndarray,  # (N, 4) sampled positive boxes
    gt_boxes: jnp.ndarray,  # (N, 4) assigned gts
    heatmap_size: int = 56,
    radius: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, hm, hm, 9) gaussian point targets + (N, 9) in-roi validity.

    Grid points are the 3x3 lattice over the GT box mapped into roi-relative
    heatmap coordinates."""
    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    gx = jnp.stack(
        [gt_boxes[:, 0], (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2, gt_boxes[:, 2]],
        axis=-1,
    )  # (N, 3)
    gy = jnp.stack(
        [gt_boxes[:, 1], (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2, gt_boxes[:, 3]],
        axis=-1,
    )
    # point k = (row r, col c): x from gx[c], y from gy[r]
    px = jnp.tile(gx, (1, 3))  # (N, 9) cols repeat
    py = jnp.repeat(gy, 3, axis=-1)  # rows repeat
    hx = (px - x1[:, None]) / w[:, None] * heatmap_size
    hy = (py - y1[:, None]) / h[:, None] * heatmap_size
    valid = (hx >= 0) & (hx < heatmap_size) & (hy >= 0) & (hy < heatmap_size)

    ys = jnp.arange(heatmap_size, dtype=jnp.float32)
    xs = jnp.arange(heatmap_size, dtype=jnp.float32)
    d2 = (ys[None, :, None, None] - hy[:, None, None, :]) ** 2 + (
        xs[None, None, :, None] - hx[:, None, None, :]
    ) ** 2
    heat = (d2 <= radius**2).astype(jnp.float32)
    return heat * valid[:, None, None, :], valid


def grid_to_boxes(
    heatmaps: jnp.ndarray,  # (N, hm, hm, 9) logits
    rois: jnp.ndarray,  # (N, 4)
) -> jnp.ndarray:
    """Decode boxes from point heatmap argmaxes (grid_head.py get_bboxes):
    edges averaged over their three aligned points."""
    n, hm, _, _ = heatmaps.shape
    flat = heatmaps.reshape(n, hm * hm, GRID_POINTS)
    idx = jnp.argmax(flat, axis=1)  # (N, 9)
    py = (idx // hm).astype(jnp.float32) + 0.5
    px = (idx % hm).astype(jnp.float32) + 0.5
    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    ix = x1[:, None] + px / hm * w[:, None]
    iy = y1[:, None] + py / hm * h[:, None]
    # cols: points 0,3,6 = left; 2,5,8 = right; rows: 0,1,2 top; 6,7,8 bottom
    left = ix[:, [0, 3, 6]].mean(axis=1)
    right = ix[:, [2, 5, 8]].mean(axis=1)
    top = iy[:, [0, 1, 2]].mean(axis=1)
    bottom = iy[:, [6, 7, 8]].mean(axis=1)
    return jnp.stack([left, top, right, bottom], axis=-1)

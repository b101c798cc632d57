"""RoIPool (max-pool RoI extraction) — pure JAX.

Parity: /root/reference/mmdet/ops/roi_pool/ (roi_pool_kernel.cu): integer
bin edges from rounded roi coords, max over each bin. Exported for
completeness (no shipped LVIS config uses it; RoIAlign superseded it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roi_pool(
    feat: jnp.ndarray,  # (H, W, C)
    rois: jnp.ndarray,  # (R, 4) xyxy image coords
    spatial_scale: float,
    out_size: int = 7,
) -> jnp.ndarray:
    """(R, out, out, C) max-pooled roi features (roi_pool_kernel.cu parity:
    start = round(x1*scale), end = round(x2*scale)+1, bins split evenly,
    empty bins yield 0)."""
    h, w, c = feat.shape
    rois = rois.astype(jnp.float32)
    x1 = jnp.round(rois[:, 0] * spatial_scale)
    y1 = jnp.round(rois[:, 1] * spatial_scale)
    x2 = jnp.round(rois[:, 2] * spatial_scale) + 1.0
    y2 = jnp.round(rois[:, 3] * spatial_scale) + 1.0
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    def one_roi(xx1, yy1, bw, bh):
        # bin index of each row/col for this roi; -1 = outside
        by = jnp.floor((ys - yy1) / bh)
        bx = jnp.floor((xs - xx1) / bw)
        by = jnp.where((ys >= yy1) & (by < out_size) & (by >= 0), by, -1.0)
        bx = jnp.where((xs >= xx1) & (bx < out_size) & (bx >= 0), bx, -1.0)
        # one-hot row/col memberships -> masked max
        oy = by[None, :] == jnp.arange(out_size, dtype=jnp.float32)[:, None]  # (out, H)
        ox = bx[None, :] == jnp.arange(out_size, dtype=jnp.float32)[:, None]  # (out, W)
        neg = jnp.finfo(jnp.float32).min
        # (out, H, 1, 1) & (1, 1, out, W) mask over feat (H, W, C)
        masked = jnp.where(
            oy[:, :, None, None, None] & ox[None, None, :, :, None],
            feat[None, :, None, :, :].astype(jnp.float32),
            neg,
        )  # (out, H, out, W, C)
        pooled = masked.max(axis=(1, 3))
        # empty bins -> 0 (kernel writes 0 when maxval stays -inf)
        return jnp.where(pooled <= neg / 2, 0.0, pooled)

    return jax.vmap(one_roi)(x1, y1, bin_w, bin_h).astype(feat.dtype)


def masked_conv2d(x, mask, weight, bias=None, padding=1):
    """Conv evaluated only at masked positions (mmdet/ops/masked_conv
    parity — used by guided anchoring): out = conv(x) * mask.

    The CUDA kernel skips computation at unmasked positions; under XLA the
    fused masked form is the efficient equivalent.
    x (B, H, W, C); mask (B, H, W) or (B, H, W, 1)."""
    import flax.linen as nn

    if mask.ndim == 3:
        mask = mask[..., None]
    y = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias
    return y * (mask > 0)

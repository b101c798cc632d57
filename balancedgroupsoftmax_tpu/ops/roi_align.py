"""RoIAlign — TPU-native replacement for the reference CUDA kernel.

Exact parity with /root/reference/mmdet/ops/roi_align/src/roi_align_kernel.cu:
- roi edges scale as start = x1*scale, end = (x2+1)*scale (the +1 convention);
- bin size = roi_extent / out_size; sample_num^2 regular samples per bin at
  (i + 0.5)/sample_num offsets;
- bilinear interpolation with the kernel's boundary rules: points outside
  [-1, size] contribute 0, coordinates clamp at 0, and the last row/column
  collapses (y_low = y_high = H-1).

The forward is expressed as XLA gathers; autodiff yields the same
scatter-add backward as the reference's atomicAdd backward kernel
(roi_align_kernel.cu ROIAlignBackward). A fused Pallas variant lives in
`pallas/roi_align.py` with this function as its numerics oracle.

Level routing parity: /root/reference/mmdet/models/roi_extractors/
single_level.py:54-73 (`map_roi_levels`: floor(log2(sqrt(area)/56 + 1e-6))).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample feat (H, W, C) at points y, x (...,) -> (..., C)."""
    h, w = feat.shape[0], feat.shape[1]
    valid = (y >= -1.0) & (y <= h) & (x >= -1.0) & (x <= w)

    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)

    collapse_y = y_low >= h - 1
    y_low = jnp.where(collapse_y, h - 1, y_low)
    y_eff = jnp.where(collapse_y, y_low.astype(y.dtype), y)
    y_high = jnp.where(collapse_y, h - 1, y_low + 1)

    collapse_x = x_low >= w - 1
    x_low = jnp.where(collapse_x, w - 1, x_low)
    x_eff = jnp.where(collapse_x, x_low.astype(x.dtype), x)
    x_high = jnp.where(collapse_x, w - 1, x_low + 1)

    ly = y_eff - y_low
    lx = x_eff - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx

    lt = feat[y_low, x_low]
    rt = feat[y_low, x_high]
    lb = feat[y_high, x_low]
    rb = feat[y_high, x_high]
    val = (
        (hy * hx)[..., None] * lt
        + (hy * lx)[..., None] * rt
        + (ly * hx)[..., None] * lb
        + (ly * lx)[..., None] * rb
    )
    return jnp.where(valid[..., None], val, 0.0)


def roi_align(
    feat: jnp.ndarray,  # (H, W, C) one level, one image
    rois: jnp.ndarray,  # (R, 4) xyxy in image coordinates
    spatial_scale: float,
    out_size: int = 7,
    sample_num: int = 2,
) -> jnp.ndarray:
    """RoIAlign -> (R, out_size, out_size, C)."""
    rois = rois.astype(jnp.float32)
    start_w = rois[:, 0] * spatial_scale
    start_h = rois[:, 1] * spatial_scale
    end_w = (rois[:, 2] + 1.0) * spatial_scale
    end_h = (rois[:, 3] + 1.0) * spatial_scale
    roi_w = jnp.maximum(end_w - start_w, 0.0)
    roi_h = jnp.maximum(end_h - start_h, 0.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    s = sample_num
    # sample coordinates: (R, out*s)
    grid = jnp.arange(out_size, dtype=jnp.float32)
    sub = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    # pos[p, i] = p + sub[i] in bin units
    pos = (grid[:, None] + sub[None, :]).reshape(-1)  # (out*s,)
    ys = start_h[:, None] + bin_h[:, None] * pos[None, :]  # (R, out*s)
    xs = start_w[:, None] + bin_w[:, None] * pos[None, :]

    yy = ys[:, :, None]  # (R, out*s, 1)
    xx = xs[:, None, :]  # (R, 1, out*s)
    yy, xx = jnp.broadcast_arrays(yy, xx)  # (R, out*s, out*s)
    vals = _bilinear(feat, yy, xx)  # (R, out*s, out*s, C)
    r = rois.shape[0]
    c = feat.shape[-1]
    vals = vals.reshape(r, out_size, s, out_size, s, c)
    return vals.mean(axis=(2, 4))


def map_roi_levels(rois: jnp.ndarray, num_levels: int, finest_scale: int = 56):
    """(R,) int32 target FPN level per roi (single_level.py:54-73)."""
    scale = jnp.sqrt(
        (rois[:, 2] - rois[:, 0] + 1.0) * (rois[:, 3] - rois[:, 1] + 1.0)
    )
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align_reference(
    feats: Sequence[jnp.ndarray],  # list of (H_l, W_l, C), strides ascending
    rois: jnp.ndarray,  # (R, 4)
    strides: Sequence[int],
    out_size: int = 7,
    sample_num: int = 2,
    finest_scale: int = 56,
) -> jnp.ndarray:
    """Reference formulation: pool every roi on every level, select by the
    routed level (single_level.py:89-107 semantics). 4x overcompute — kept
    as the numerics oracle for the fused path below."""
    num_levels = len(feats)
    lvls = map_roi_levels(rois, num_levels, finest_scale)
    out = None
    for i, (f, s) in enumerate(zip(feats, strides)):
        pooled = roi_align(f, rois, 1.0 / s, out_size, sample_num)
        sel = (lvls == i)[:, None, None, None]
        out = jnp.where(sel, pooled, 0.0) if out is None else out + jnp.where(sel, pooled, 0.0)
    return out


def multilevel_roi_align(
    feats: Sequence[jnp.ndarray],  # list of (H_l, W_l, C), strides ascending
    rois: jnp.ndarray,  # (R, 4)
    strides: Sequence[int],
    out_size: int = 7,
    sample_num: int = 2,
    finest_scale: int = 56,
) -> jnp.ndarray:
    """Fused multi-level RoIAlign: one gather over a flattened level pyramid.

    TPU redesign of SingleRoIExtractor + the RoIAlign CUDA kernel: all FPN
    levels are flattened into a single (sum H_l*W_l, C) buffer; each roi
    computes its sample coordinates in its *routed* level's grid and gathers
    4 bilinear corners as flat indices with the level offset added. One
    gather pass per corner — no per-level loop, no 4x overcompute, channel
    dim stays dense (lane-friendly). Numerically identical to
    `multilevel_roi_align_reference` (tests/test_roi_align.py).
    """
    num_levels = len(feats)
    c = feats[0].shape[-1]
    dtype = feats[0].dtype
    hs = np.array([f.shape[0] for f in feats], np.int32)
    ws = np.array([f.shape[1] for f in feats], np.int32)
    offsets = np.concatenate([[0], np.cumsum(hs.astype(np.int64) * ws)]).astype(
        np.int32
    )
    # one zero pad row so the (2, C) slab at the very last cell stays in
    # bounds without CLIP shifting its start index
    flat = jnp.concatenate(
        [f.reshape(-1, c) for f in feats] + [jnp.zeros((1, c), feats[0].dtype)],
        axis=0,
    )

    lvls = map_roi_levels(rois, num_levels, finest_scale)  # (R,)
    stride_arr = jnp.asarray(np.asarray(strides, np.float32))
    scale = 1.0 / stride_arr[lvls]  # (R,)
    lh = jnp.asarray(hs)[lvls]  # (R,) level height
    lw = jnp.asarray(ws)[lvls]
    loff = jnp.asarray(offsets[:-1])[lvls]  # (R,)

    rois = rois.astype(jnp.float32)
    start_w = rois[:, 0] * scale
    start_h = rois[:, 1] * scale
    end_w = (rois[:, 2] + 1.0) * scale
    end_h = (rois[:, 3] + 1.0) * scale
    bin_w = jnp.maximum(end_w - start_w, 0.0) / out_size
    bin_h = jnp.maximum(end_h - start_h, 0.0) / out_size

    s = sample_num
    grid = jnp.arange(out_size, dtype=jnp.float32)
    sub = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    pos = (grid[:, None] + sub[None, :]).reshape(-1)  # (out*s,)
    ys = start_h[:, None] + bin_h[:, None] * pos[None, :]  # (R, out*s)
    xs = start_w[:, None] + bin_w[:, None] * pos[None, :]

    fh = lh.astype(jnp.float32)[:, None]
    fw = lw.astype(jnp.float32)[:, None]
    yvalid = (ys >= -1.0) & (ys <= fh)
    xvalid = (xs >= -1.0) & (xs <= fw)

    y = jnp.clip(ys, 0.0, None)
    x = jnp.clip(xs, 0.0, None)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    cy = y_low >= lh[:, None] - 1
    y_low = jnp.where(cy, lh[:, None] - 1, y_low)
    y_eff = jnp.where(cy, y_low.astype(jnp.float32), y)
    y_high = jnp.where(cy, lh[:, None] - 1, y_low + 1)
    cx = x_low >= lw[:, None] - 1
    x_low = jnp.where(cx, lw[:, None] - 1, x_low)
    x_eff = jnp.where(cx, x_low.astype(jnp.float32), x)
    x_high = jnp.where(cx, lw[:, None] - 1, x_low + 1)

    ly = (y_eff - y_low)[:, :, None]  # (R, os, 1)
    lx = (x_eff - x_low)[:, None, :]  # (R, 1, os)
    hy = 1.0 - ly
    hx = 1.0 - lx

    base = loff[:, None, None]
    w_ = lw[:, None]
    iy0 = (y_low * w_)[:, :, None]  # (R, os, 1)
    iy1 = (y_high * w_)[:, :, None]
    ix0 = x_low[:, None, :]  # (R, 1, os)

    # Fetch (2, C) column-pair slabs: x_low and x_low+1 are adjacent rows of
    # the flattened (H*W, C) level, so one gather with slice size (2, C)
    # serves both x corners — halving the gather count. When x collapses at
    # the border (x_high == x_low) the "high" sample's weights lx are zero,
    # so the extra row read (next spatial cell, or the 1-row pad at the very
    # end of the buffer) never contributes.
    os_ = out_size * s
    r = rois.shape[0]

    def slab_gather(starts):  # starts (R, os, os) int32 -> (R, os, os, 2, C)
        gd = jax.lax.GatherDimensionNumbers(
            offset_dims=(3, 4),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        idx = jnp.stack(
            [starts, jnp.zeros_like(starts)], axis=-1
        )  # (R, os, os, 2)
        return jax.lax.gather(
            flat,
            idx,
            gd,
            slice_sizes=(2, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    top = slab_gather(jnp.broadcast_to(base + iy0 + ix0, (r, os_, os_)))
    bot = slab_gather(jnp.broadcast_to(base + iy1 + ix0, (r, os_, os_)))
    g00 = top[..., 0, :]
    g01 = top[..., 1, :]
    g10 = bot[..., 0, :]
    g11 = bot[..., 1, :]

    w00 = (hy * hx)[..., None]
    w01 = (hy * lx)[..., None]
    w10 = (ly * hx)[..., None]
    w11 = (ly * lx)[..., None]
    vals = (
        g00 * w00.astype(dtype)
        + g01 * w01.astype(dtype)
        + g10 * w10.astype(dtype)
        + g11 * w11.astype(dtype)
    )
    valid = (yvalid[:, :, None] & xvalid[:, None, :])[..., None]
    vals = jnp.where(valid, vals, jnp.zeros((), dtype))

    r = rois.shape[0]
    vals = vals.reshape(r, out_size, s, out_size, s, c)
    return vals.mean(axis=(2, 4))

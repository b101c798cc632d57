"""Deformable convolution v1/v2 as gather + matmul (TPU-native).

Replaces /root/reference/mmdet/ops/dcn/ (deform_conv_cuda_kernel.cu, 1567
LoC CUDA: im2col with learned offsets). TPU formulation: the offset field
(from a regular conv) shifts each kernel tap's sampling position; sampling
is bilinear gathers over the input, and the convolution reduces to one
matmul of the gathered (ktaps*C_in) columns against the flattened kernel —
exactly the deformable-im2col + GEMM structure of the reference, with XLA
gathers instead of CUDA im2col.

v2 (ModulatedDeformConv, deform_conv.py DCNv2) multiplies each tap by a
learned sigmoid modulation mask.

Used by the backbone's dcn stages (HTC-DCN configs: dconv c3-c5,
configs/bags/gs_htc_dconv_c3-c5_mstrain_400_1400_x101_64x4d_fpn_20e.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Grouped-contraction formulation (read at TRACE time — set before
# building/jitting the model; work_dirs/dcn_bench.py A/Bs these):
#   True  -> one dense GEMM against a block-diagonal weight (no
#            transposes; trades G x MXU FLOPs for clean layouts)
#   False -> per-group batched matmul (the true-FLOPs form; its
#            transposes put taps=9 in the tiled minor dim, which can
#            inflate 14x under bf16 layouts)
DENSE_GROUPS = True
# Force f32 gathered corners (the pre-round-5 behavior) for A/B.
F32_COLS = False
# Fetch each sample's 2x2 bilinear support as ONE gather of a (2, 2, C)
# patch instead of four independent corner row-gathers (4x fewer gather
# descriptors, same bytes). "auto" (default) picks per layer by grid
# size — measured on-chip (BENCHMARKS round 5): patch wins 38%/23% at
# c3/c4 and ties at c5, so small grids keep the corner form.
PATCH_GATHER = "auto"
PATCH_GATHER_MIN_POSITIONS = 2000


def _bilinear_hw(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); ys/xs (...,) -> (..., C); zero outside bounds.

    The blend stays in the IMAGE dtype: a bf16 backbone (the production
    path) must not silently promote the four gathered corner tensors to
    f32 — that quadruples^W doubles the (H, W, taps, C) im2col HBM
    traffic of every DCN layer (the dominant cost of gs_htc_dcn_x101,
    BENCHMARKS round 4) for precision the surrounding bf16 convs don't
    have anyway. Index math and bilinear fractions stay f32.
    """
    h, w = img.shape[0], img.shape[1]
    use_patch = PATCH_GATHER
    if use_patch == "auto":
        n_pos = 1
        for d in ys.shape:
            n_pos *= int(d)
        use_patch = n_pos >= PATCH_GATHER_MIN_POSITIONS
    dt = jnp.float32 if F32_COLS else img.dtype
    img = img.astype(dt)
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    # clip floor and floor+1 INDEPENDENTLY: deriving the high corner from
    # the already-clipped low corner put samples with a coordinate in
    # (-1, 0) on row/col 1 instead of 0 (caught by the numpy oracle of
    # deform_conv_cuda_kernel.cu deformable_im2col_bilinear:84-113; the
    # zero-weight validity masks hide the low corner's clip, not this)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    # corner validity (the CUDA kernel zero-pads out-of-bounds taps)
    v00 = (y0 >= 0) & (x0 >= 0)
    v01 = (y0 >= 0) & (x0 + 1 <= w - 1)
    v10 = (y0 + 1 <= h - 1) & (x0 >= 0)
    v11 = (y0 + 1 <= h - 1) & (x0 + 1 <= w - 1)
    zero = jnp.zeros((), dt)
    if use_patch:
        # one (2, 2, C) patch gather per sample. The patch anchors at
        # (ys0, xs0) = clip(floor, 0, size-2); each CUDA corner maps to a
        # patch cell by (corner - anchor) in {0, 1} — coincident/clamped
        # corners simply accumulate their weights on the same cell, so
        # the boundary semantics (incl. the (-1, 0) band) are identical
        # to the four-gather form by construction.
        y0c = y0.astype(jnp.int32)
        x0c = x0.astype(jnp.int32)
        ys0 = jnp.clip(y0c, 0, h - 2)
        xs0 = jnp.clip(x0c, 0, w - 2)
        shp = ys.shape
        starts = jnp.stack(
            [ys0.reshape(-1), xs0.reshape(-1)], axis=-1
        )
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        patch = jax.lax.gather(
            img, starts, dnums, slice_sizes=(2, 2, img.shape[-1]),
            mode=jax.lax.GatherScatterMode.CLIP,
        ).reshape(*shp, 2, 2, img.shape[-1])
        wly = jnp.where(y0 >= 0, 1.0, 0.0) * (1 - ly)
        why = jnp.where(y0 + 1 <= h - 1, 1.0, 0.0) * ly
        wlx = jnp.where(x0 >= 0, 1.0, 0.0) * (1 - lx)
        whx = jnp.where(x0 + 1 <= w - 1, 1.0, 0.0) * lx
        a_lo = (y0i - ys0)[..., None]  # {0,1} cell of the low-y corner
        a_hi = (y1i - ys0)[..., None]
        b_lo = (x0i - xs0)[..., None]
        b_hi = (x1i - xs0)[..., None]
        cell = jnp.arange(2)
        wy_cell = wly[..., None] * (cell == a_lo) + why[..., None] * (cell == a_hi)
        wx_cell = wlx[..., None] * (cell == b_lo) + whx[..., None] * (cell == b_hi)
        wgt2 = (wy_cell[..., :, None] * wx_cell[..., None, :]).astype(dt)
        out = (patch * wgt2[..., None]).sum(axis=(-3, -2))
        return jnp.where(valid[..., None], out, zero)
    g00 = jnp.where(v00[..., None], img[y0i, x0i], zero)
    g01 = jnp.where(v01[..., None], img[y0i, x1i], zero)
    g10 = jnp.where(v10[..., None], img[y1i, x0i], zero)
    g11 = jnp.where(v11[..., None], img[y1i, x1i], zero)
    wc = lambda a: a.astype(dt)[..., None]
    out = (
        g00 * wc((1 - ly) * (1 - lx))
        + g01 * wc((1 - ly) * lx)
        + g10 * wc(ly * (1 - lx))
        + g11 * wc(ly * lx)
    )
    return jnp.where(valid[..., None], out, zero)


def _shift_window_cols(
    x: jnp.ndarray,  # (H, W, C)
    offsets: jnp.ndarray,  # (H_out, W_out, taps, 2) f32 — (dy, dx)
    kh: int,
    kw: int,
    stride: int,
    padding: int,
    window: int,
) -> jnp.ndarray:
    """Bilinear im2col as a static sum of integer shifts — NO gather.

    Decomposition: tap k of output position (i, j) samples the image at
    (i*stride - padding + ky + dy, ...). With the learned offset clamped
    to [-window, window] cells, the integer part of the displacement is
    one of the (k + 2*window) static shifts, so the bilinear blend is

        cols[i,j,k,c] = sum_{s,t} wy_s[i,j,k] * wx_t[i,j,k] * x[ai+s, aj+t, c]

    where every x[ai+s, aj+t] term is a plain strided SLICE of the
    zero-padded image and wy/wx are piecewise-linear one-hot weights (4
    nonzeros per sample). This replaces the per-sample gather (302k
    descriptors per c4 layer, the dominant DCN cost — BENCHMARKS round 5)
    with (k+2w)^2 dense VPU FMA passes, and its transpose is a sum of
    pads — so the DCN backward has no scatter either.

    Semantics vs the CUDA im2col (deform_conv_cuda_kernel.cu:84-113):
    exactly the gather path evaluated at clip(offsets, +-window) — i.e.
    bit-matching whenever |offset| <= window (corner zero-padding and the
    fully-outside-image rule both fall out of the zero pad + validity
    mask), a bounded deformation range beyond. Gradients flow to the
    offsets through the piecewise-linear weights, as in the reference.
    """
    h, w_in, c = x.shape
    h_out, w_out, taps, _ = offsets.shape
    dt = x.dtype

    tap_y = jnp.repeat(jnp.arange(kh, dtype=jnp.float32), kw)  # (taps,)
    tap_x = jnp.tile(jnp.arange(kw, dtype=jnp.float32), kh)
    dy = jnp.clip(offsets[..., 0], -float(window), float(window))
    dx = jnp.clip(offsets[..., 1], -float(window), float(window))
    rel_y = tap_y[None, None, :] + dy  # (Ho, Wo, taps) in [-w, kh-1+w]
    rel_x = tap_x[None, None, :] + dx

    # validity on the CLAMPED absolute position, so the whole path is
    # exactly "the bilinear gather evaluated at clip(offsets, +-window)"
    # — the CUDA rule zeroes samples at y <= -1 or y >= h
    base_y = (
        jnp.arange(h_out, dtype=jnp.float32) * stride - padding
    )[:, None, None]
    base_x = (
        jnp.arange(w_out, dtype=jnp.float32) * stride - padding
    )[None, :, None]
    ys_abs = base_y + rel_y
    xs_abs = base_x + rel_x
    valid = (ys_abs > -1.0) & (ys_abs < h) & (xs_abs > -1.0) & (xs_abs < w_in)

    fy = jnp.floor(rel_y)
    fx = jnp.floor(rel_x)
    fracy = rel_y - fy
    fracx = rel_x - fx
    fy = fy.astype(jnp.int32)
    fx = fx.astype(jnp.int32)

    # zero-pad so every (shift, output-position) pair is a plain slice;
    # out-of-image corners read zeros = the CUDA corner rule
    pt = padding + window
    pl_ = padding + window
    hp = (h_out - 1) * stride + kh + 2 * window
    wp = (w_out - 1) * stride + kw + 2 * window
    xp = jnp.zeros((hp, wp, c), dt)
    xp = jax.lax.dynamic_update_slice(xp, x, (pt, pl_, 0))

    shifts_y = range(-window, kh + window)  # kh + 2*window values
    shifts_x = range(-window, kw + window)
    wys = {
        s: jnp.where(fy == s, 1.0 - fracy, 0.0)
        + jnp.where(fy == s - 1, fracy, 0.0)
        for s in shifts_y
    }
    wxs = {
        t: jnp.where(fx == t, 1.0 - fracx, 0.0)
        + jnp.where(fx == t - 1, fracx, 0.0)
        for t in shifts_x
    }

    acc = jnp.zeros((h_out, w_out, taps, c), dt)
    for s in shifts_y:
        y0 = s + window  # xp row of output row 0 = 0*stride - padding + s + pt
        rows = jax.lax.slice(
            xp, (y0, 0, 0), (y0 + (h_out - 1) * stride + 1, wp, c),
            (stride, 1, 1),
        )  # (Ho, Wp, C)
        for t in shifts_x:
            x0 = t + window
            patch = jax.lax.slice(
                rows, (0, x0, 0), (h_out, x0 + (w_out - 1) * stride + 1, c),
                (1, stride, 1),
            )  # (Ho, Wo, C)
            wgt = (wys[s] * wxs[t]).astype(dt)  # (Ho, Wo, taps)
            acc = acc + wgt[..., None] * patch[:, :, None, :]
    zero = jnp.zeros((), dt)
    return jnp.where(valid[..., None], acc, zero)


def deform_conv2d(
    x: jnp.ndarray,  # (H, W, C_in) single image
    offsets: jnp.ndarray,  # (H_out, W_out, 2*kh*kw) — (dy, dx) per tap
    weight: jnp.ndarray,  # (kh, kw, C_in // groups, C_out) — flax layout
    mask: jnp.ndarray | None = None,  # (H_out, W_out, kh*kw) v2 modulation
    stride: int = 1,
    padding: int = 1,
    groups: int = 1,
    shift_window: int = 0,
) -> jnp.ndarray:
    """(H_out, W_out, C_out). Offset layout matches the reference's
    conv_offset output: channel 2k = dy of tap k, 2k+1 = dx (row-major
    taps). groups follows the grouped-conv semantics of the CUDA kernel
    (deform_conv_cuda.cpp `group` — input group g contracts against output
    slice g), which the X101-64x4d DCN configs rely on (dcn=dict(groups=64),
    gs_htc_dconv_c3-c5_*.py).

    shift_window > 0 selects the gather-free shift-decomposition im2col
    (`_shift_window_cols`): exact for |offset| <= shift_window cells,
    clamped beyond. 0 = the exact-everywhere bilinear gather."""
    kh, kw, c_g, c_out = weight.shape
    c_in = x.shape[-1]
    assert c_g * groups == c_in and c_out % groups == 0
    h_out, w_out = offsets.shape[0], offsets.shape[1]
    taps = kh * kw

    off = offsets.reshape(h_out, w_out, taps, 2)
    if shift_window > 0:
        cols = _shift_window_cols(x, off, kh, kw, stride, padding, shift_window)
    else:
        base_y = jnp.arange(h_out, dtype=jnp.float32) * stride - padding
        base_x = jnp.arange(w_out, dtype=jnp.float32) * stride - padding
        ky = jnp.arange(kh, dtype=jnp.float32)
        kx = jnp.arange(kw, dtype=jnp.float32)
        tap_y = jnp.repeat(ky, kw)  # (taps,)
        tap_x = jnp.tile(kx, kh)

        ys = base_y[:, None, None] + tap_y[None, None, :] + off[..., 0]
        xs = base_x[None, :, None] + tap_x[None, None, :] + off[..., 1]

        cols = _bilinear_hw(x, ys, xs)  # (H_out, W_out, taps, C_in)
    if mask is not None:
        cols = cols * mask[..., None].astype(cols.dtype)
    if groups == 1:
        cols = cols.reshape(h_out * w_out, taps * c_in)
        w2 = weight.reshape(taps * c_in, c_out).astype(cols.dtype)
        out = jnp.dot(cols, w2, preferred_element_type=jnp.float32)
    elif not DENSE_GROUPS:
        # per-group batched matmul (true-FLOPs form; kept for A/B — its
        # transposes can pick taps-minor tiled layouts)
        og = c_out // groups
        cg = cols.reshape(h_out * w_out, taps, groups, c_g)
        cg = jnp.transpose(cg, (2, 0, 1, 3)).reshape(
            groups, h_out * w_out, taps * c_g
        )
        wg = weight.reshape(taps, c_g, groups, og)
        wg = jnp.transpose(wg, (2, 0, 1, 3)).reshape(
            groups, taps * c_g, og
        ).astype(cg.dtype)
        out = jax.lax.dot_general(
            cg, wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, HW, Og)
        out = jnp.transpose(out, (1, 0, 2)).reshape(h_out * w_out, c_out)
    else:
        # Grouped contraction as ONE dense GEMM against a block-diagonal
        # weight — deliberately "wasting" G x MXU FLOPs to keep layouts
        # clean. The per-group batched-matmul formulation needs transposes
        # whose tiled layouts put taps=9 in the minor dimension (padded
        # 9 -> 128, a 14x inflation): one c4 X101 layer at batch 8 then
        # ALLOCATES 19 GB and fails to compile on a 16 GB chip. The dense
        # (HW, taps*C_in) @ (taps*C_in, C_out) GEMM has no transposes, a
        # clean minor dim, and its extra FLOPs are ~3 ms/layer at c3 on
        # the MXU — far below the relayout cost it removes. Zeros in the
        # off-group blocks reproduce the grouped semantics exactly
        # (deform_conv_cuda.cpp `group`).
        og = c_out // groups
        w3 = weight.reshape(taps, c_g, c_out)
        # gmask[g, j] = 1 iff output channel j belongs to input group g
        gmask = jnp.repeat(
            jnp.eye(groups, dtype=weight.dtype), og, axis=1
        )  # (G, C_out)
        w_dense = (w3[:, None, :, :] * gmask[None, :, None, :]).reshape(
            taps * c_in, c_out
        ).astype(cols.dtype)  # cols channel order is (taps, G, c_g) — matches
        out = jnp.dot(
            cols.reshape(h_out * w_out, taps * c_in),
            w_dense,
            preferred_element_type=jnp.float32,
        )
    return out.reshape(h_out, w_out, c_out).astype(x.dtype)


def deform_roi_pool(
    feat: jnp.ndarray,  # (H, W, C)
    rois: jnp.ndarray,  # (R, 4) xyxy image coords
    offsets: jnp.ndarray,  # (R, out, out, 2) normalized (dy, dx) per bin
    spatial_scale: float,
    out_size: int = 7,
    sample_num: int = 2,
    gamma: float = 0.1,
) -> jnp.ndarray:
    """Deformable RoI pooling (mmdet/ops/dcn/deform_pool.py parity).

    Each output bin's sample window shifts by `gamma * roi_size * offset`
    (deform_pool_cuda_kernel.cu); offsets come from a small head over the
    plainly-pooled features (DeformRoIPoolingPack). With zero offsets this
    equals RoIAlign.
    """
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
    grid = jnp.arange(out_size, dtype=jnp.float32)
    sub = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    pos = (grid[:, None] + sub[None, :]).reshape(-1)  # (out*s,)
    ys = start_h[:, None] + bin_h[:, None] * pos[None, :]  # (R, out*s)
    xs = start_w[:, None] + bin_w[:, None] * pos[None, :]
    # per-bin offsets scaled by roi extent (broadcast to the bin's samples)
    dy = jnp.repeat(jnp.repeat(offsets[..., 0], s, axis=1), s, axis=2)
    dx = jnp.repeat(jnp.repeat(offsets[..., 1], s, axis=1), s, axis=2)
    yy = ys[:, :, None] + gamma * roi_h[:, None, None] * dy
    xx = xs[:, None, :] + gamma * roi_w[:, None, None] * dx
    yy, xx = jnp.broadcast_arrays(yy, xx)
    vals = jax.vmap(lambda y_, x_: _bilinear_hw(feat, y_, x_))(yy, xx)
    r = rois.shape[0]
    c = feat.shape[-1]
    vals = vals.reshape(r, out_size, s, out_size, s, c)
    return vals.mean(axis=(2, 4))


class DeformConv(nn.Module):
    """DCN v1/v2 layer: offset (+mask) conv then deformable conv.

    Parity: mmdet/ops/dcn/deform_conv.py DeformConvPack /
    ModulatedDeformConvPack — the offset conv initializes to zero so the
    layer starts as a plain conv.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    modulated: bool = True  # v2
    groups: int = 1  # grouped conv (X101 DCN configs: dcn=dict(groups=64))
    # >0: gather-free shift-decomposition im2col, offsets clamped to
    # +-shift_window cells (see _shift_window_cols); 0: exact gather
    shift_window: int = 0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (B, H, W, C_in) -> (B, H_out, W_out, features)."""
        k = self.kernel_size
        taps = k * k
        off_ch = 3 * taps if self.modulated else 2 * taps
        off_out = nn.Conv(
            off_ch,
            (k, k),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset",
        )(x)
        if self.modulated:
            offsets = off_out[..., : 2 * taps].astype(jnp.float32)
            # v2 modulation (modulated_deform_conv: sigmoid gate per tap)
            mask = jax.nn.sigmoid(off_out[..., 2 * taps :].astype(jnp.float32))
        else:
            offsets = off_out.astype(jnp.float32)
            mask = None

        weight = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, x.shape[-1] // self.groups, self.features),
        )

        if self.shift_window > 0 and jax.default_backend() == "tpu":
            # fused Pallas forward (im2col never hits HBM; runs at the
            # plain-conv floor — BENCHMARKS round 5) with the dense XLA
            # shift-path backward; same clip(offsets, +-window) semantics
            from ..pallas.deform_conv import deform_conv2d_fused

            out = deform_conv2d_fused(
                x, offsets, weight, mask, self.stride, self.padding,
                self.groups, self.shift_window, False,
            )
        elif mask is not None:
            out = jax.vmap(
                lambda xi, oi, mi: deform_conv2d(
                    xi, oi, weight, mi, self.stride, self.padding, self.groups,
                    self.shift_window,
                )
            )(x, offsets, mask)
        else:
            out = jax.vmap(
                lambda xi, oi: deform_conv2d(
                    xi, oi, weight, None, self.stride, self.padding, self.groups,
                    self.shift_window,
                )
            )(x, offsets)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out

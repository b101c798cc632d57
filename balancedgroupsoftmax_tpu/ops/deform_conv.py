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
    dt = img.dtype
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    # corner validity (the CUDA kernel zero-pads out-of-bounds taps)
    v00 = (y0 >= 0) & (x0 >= 0)
    v01 = (y0 >= 0) & (x0 + 1 <= w - 1)
    v10 = (y0 + 1 <= h - 1) & (x0 >= 0)
    v11 = (y0 + 1 <= h - 1) & (x0 + 1 <= w - 1)
    zero = jnp.zeros((), dt)
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


def deform_conv2d(
    x: jnp.ndarray,  # (H, W, C_in) single image
    offsets: jnp.ndarray,  # (H_out, W_out, 2*kh*kw) — (dy, dx) per tap
    weight: jnp.ndarray,  # (kh, kw, C_in // groups, C_out) — flax layout
    mask: jnp.ndarray | None = None,  # (H_out, W_out, kh*kw) v2 modulation
    stride: int = 1,
    padding: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """(H_out, W_out, C_out). Offset layout matches the reference's
    conv_offset output: channel 2k = dy of tap k, 2k+1 = dx (row-major
    taps). groups follows the grouped-conv semantics of the CUDA kernel
    (deform_conv_cuda.cpp `group` — input group g contracts against output
    slice g), which the X101-64x4d DCN configs rely on (dcn=dict(groups=64),
    gs_htc_dconv_c3-c5_*.py)."""
    kh, kw, c_g, c_out = weight.shape
    c_in = x.shape[-1]
    assert c_g * groups == c_in and c_out % groups == 0
    h_out, w_out = offsets.shape[0], offsets.shape[1]
    taps = kh * kw

    base_y = jnp.arange(h_out, dtype=jnp.float32) * stride - padding
    base_x = jnp.arange(w_out, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(kh, dtype=jnp.float32)
    kx = jnp.arange(kw, dtype=jnp.float32)
    tap_y = jnp.repeat(ky, kw)  # (taps,)
    tap_x = jnp.tile(kx, kh)

    off = offsets.reshape(h_out, w_out, taps, 2)
    ys = base_y[:, None, None] + tap_y[None, None, :] + off[..., 0]
    xs = base_x[None, :, None] + tap_x[None, None, :] + off[..., 1]

    cols = _bilinear_hw(x, ys, xs)  # (H_out, W_out, taps, C_in)
    if mask is not None:
        cols = cols * mask[..., None]
    if groups == 1:
        cols = cols.reshape(h_out * w_out, taps * c_in)
        w2 = weight.reshape(taps * c_in, c_out)
        out = jnp.dot(cols, w2, preferred_element_type=jnp.float32)
    else:
        # grouped: input group g x kernel output slice g — a batched matmul
        # over G small (HW, taps*Cg) @ (taps*Cg, Og) contractions. 64x fewer
        # FLOPs than the dense form at X101's G=64 (and the dense form is
        # NOT the reference's semantics).
        og = c_out // groups
        cg = cols.reshape(h_out * w_out, taps, groups, c_g)
        cg = jnp.transpose(cg, (2, 0, 1, 3)).reshape(
            groups, h_out * w_out, taps * c_g
        )
        wg = weight.reshape(taps, c_g, groups, og)
        wg = jnp.transpose(wg, (2, 0, 1, 3)).reshape(groups, taps * c_g, og)
        out = jax.lax.dot_general(
            cg, wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, HW, Og)
        out = jnp.transpose(out, (1, 0, 2)).reshape(h_out * w_out, c_out)
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

        if mask is not None:
            out = jax.vmap(
                lambda xi, oi, mi: deform_conv2d(
                    xi, oi, weight, mi, self.stride, self.padding, self.groups
                )
            )(x, offsets, mask)
        else:
            out = jax.vmap(
                lambda xi, oi: deform_conv2d(
                    xi, oi, weight, None, self.stride, self.padding, self.groups
                )
            )(x, offsets)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out

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
    """img (H, W, C); ys/xs (...,) -> (..., C); zero outside bounds."""
    h, w = img.shape[0], img.shape[1]
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
    g00 = jnp.where(v00[..., None], img[y0i, x0i], 0.0)
    g01 = jnp.where(v01[..., None], img[y0i, x1i], 0.0)
    g10 = jnp.where(v10[..., None], img[y1i, x0i], 0.0)
    g11 = jnp.where(v11[..., None], img[y1i, x1i], 0.0)
    out = (
        g00 * ((1 - ly) * (1 - lx))[..., None]
        + g01 * ((1 - ly) * lx)[..., None]
        + g10 * (ly * (1 - lx))[..., None]
        + g11 * (ly * lx)[..., None]
    )
    return jnp.where(valid[..., None], out, 0.0)


def deform_conv2d(
    x: jnp.ndarray,  # (H, W, C_in) single image
    offsets: jnp.ndarray,  # (H_out, W_out, 2*kh*kw) — (dy, dx) per tap
    weight: jnp.ndarray,  # (kh, kw, C_in, C_out)
    mask: jnp.ndarray | None = None,  # (H_out, W_out, kh*kw) v2 modulation
    stride: int = 1,
    padding: int = 1,
) -> jnp.ndarray:
    """(H_out, W_out, C_out). Offset layout matches the reference's
    conv_offset output: channel 2k = dy of tap k, 2k+1 = dx (row-major
    taps)."""
    kh, kw, c_in, c_out = weight.shape
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
    cols = cols.reshape(h_out * w_out, taps * c_in)
    w2 = weight.reshape(taps, c_in, c_out).reshape(taps * c_in, c_out)
    out = jnp.dot(cols, w2, preferred_element_type=jnp.float32)
    return out.reshape(h_out, w_out, c_out).astype(x.dtype)


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
            (k, k, x.shape[-1], self.features),
        )

        if mask is not None:
            out = jax.vmap(
                lambda xi, oi, mi: deform_conv2d(
                    xi, oi, weight, mi, self.stride, self.padding
                )
            )(x, offsets, mask)
        else:
            out = jax.vmap(
                lambda xi, oi: deform_conv2d(
                    xi, oi, weight, None, self.stride, self.padding
                )
            )(x, offsets)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out

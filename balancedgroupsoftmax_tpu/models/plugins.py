"""Attention/context plugins: ContextBlock (GCNet) and NonLocal2D.

Parity: /root/reference/mmdet/ops/context_block.py (ContextBlock with
'att' pooling + channel_add/channel_mul fusion) and
mmdet/models/plugins/non_local.py (NonLocal2D, embedded gaussian).
These are backbone plug-ins in the reference's GCB/NonLocal configs.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ContextBlock(nn.Module):
    """Global context block (GCNet)."""

    ratio: float = 1.0 / 16.0
    pooling_type: str = "att"  # 'att' | 'avg'
    fusion_types: Tuple[str, ...] = ("channel_add",)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (B, H, W, C)."""
        b, h, w, c = x.shape
        planes = max(int(c * self.ratio), 1)
        if self.pooling_type == "att":
            attn = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_mask")(x)
            attn = jax.nn.softmax(attn.reshape(b, h * w, 1), axis=1)
            context = jnp.einsum(
                "bnc,bnk->bkc", x.reshape(b, h * w, c), attn
            )  # (B, 1, C)
            context = context.reshape(b, 1, 1, c)
        else:
            context = x.mean(axis=(1, 2), keepdims=True)

        out = x
        if "channel_mul" in self.fusion_types:
            t = nn.Conv(planes, (1, 1), dtype=self.dtype, name="mul_conv1")(context)
            t = nn.LayerNorm(dtype=self.dtype, name="mul_ln")(t)
            t = nn.relu(t)
            t = nn.Conv(c, (1, 1), dtype=self.dtype, name="mul_conv2")(t)
            out = out * jax.nn.sigmoid(t)
        if "channel_add" in self.fusion_types:
            t = nn.Conv(planes, (1, 1), dtype=self.dtype, name="add_conv1")(context)
            t = nn.LayerNorm(dtype=self.dtype, name="add_ln")(t)
            t = nn.relu(t)
            t = nn.Conv(c, (1, 1), dtype=self.dtype, name="add_conv2")(t)
            out = out + t
        return out


class GeneralizedAttention(nn.Module):
    """Generalized attention block (mmdet/models/plugins/
    generalized_attention.py, '1111' configuration: content-content +
    content-position terms). Backbone plug-in for the empirical attention
    configs."""

    num_heads: int = 8
    kv_stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        heads = self.num_heads
        dk = max(c // heads, 1)
        q = nn.Conv(heads * dk, (1, 1), dtype=self.dtype, name="query")(x)
        kv = x[:, :: self.kv_stride, :: self.kv_stride, :]
        hk, wk = kv.shape[1], kv.shape[2]
        k = nn.Conv(heads * dk, (1, 1), dtype=self.dtype, name="key")(kv)
        v = nn.Conv(heads * dk, (1, 1), dtype=self.dtype, name="value")(kv)

        # relative-position embeddings (content-position term)
        pos_h = self.param("pos_h", nn.initializers.normal(0.01), (2 * h, heads, dk))
        pos_w = self.param("pos_w", nn.initializers.normal(0.01), (2 * w, heads, dk))
        yy = jnp.arange(h)[:, None] - jnp.arange(0, h, self.kv_stride)[None, :] + h
        xx = jnp.arange(w)[:, None] - jnp.arange(0, w, self.kv_stride)[None, :] + w

        q_ = q.reshape(b, h * w, heads, dk)
        k_ = k.reshape(b, hk * wk, heads, dk)
        v_ = v.reshape(b, hk * wk, heads, dk)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q_, k_) / jnp.sqrt(float(dk))
        # content-position: q . pos_emb of relative offset (separable h/w)
        qh = q.reshape(b, h, w, heads, dk)
        eh = pos_h[yy]  # (h, hk, heads, dk)
        ew = pos_w[xx]  # (w, wk, heads, dk)
        bias_h = jnp.einsum("byxhd,yYhd->bhyxY", qh, eh)  # (b,heads,h,w,hk)
        bias_w = jnp.einsum("byxhd,xXhd->bhyxX", qh, ew)  # (b,heads,h,w,wk)
        bias = (
            bias_h[..., :, None] + bias_w[..., None, :]
        ).reshape(b, heads, h * w, hk * wk) / jnp.sqrt(float(dk))
        attn = jax.nn.softmax(logits + bias, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v_).reshape(b, h, w, heads * dk)
        out = nn.Conv(
            c, (1, 1), kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="proj",
        )(out)
        return x + out


class NonLocal2D(nn.Module):
    """Non-local block, embedded-gaussian mode."""

    reduction: int = 2
    use_scale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        inter = max(c // self.reduction, 1)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x).reshape(b, h * w, inter)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x).reshape(
            b, h * w, inter
        )
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x).reshape(
            b, h * w, inter
        )
        attn = jnp.einsum("bnc,bmc->bnm", theta, phi)
        if self.use_scale:
            attn = attn / jnp.sqrt(jnp.asarray(inter, attn.dtype))
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", attn, g).reshape(b, h, w, inter)
        y = nn.Conv(
            c, (1, 1), dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="conv_out",
        )(y)
        return x + y

"""FCN mask head (Mask R-CNN / HTC).

Parity: /root/reference/mmdet/models/mask_heads/fcn_mask_head.py — 4 3x3
convs (256 ch) + 2x deconv + 1x1 per-class mask logits; loss = binary CE on
the target-class mask over positive rois (fcn_mask_head.py:109-123).
HTCMaskHead (htc_mask_head.py) adds a conv_res 1x1 for the mask information
flow, available via `with_conv_res`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import MaskHeadConfig


class _ClassSelect1x1(nn.Module):
    """The mask head's final per-class 1x1 conv, with an optional
    class-selected path that computes only each roi's target-class map.

    Declares the SAME params an `nn.Conv` would — kernel (1, 1, C, out)
    and bias (out,) under this module's name — so checkpoints are
    byte-identical to the dense-conv layout, without the throwaway
    bound-call trick (it depended on Flax inline-binding semantics and on
    XLA DCE'ing a dummy conv)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, labels=None):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.normal(0.001),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if labels is None:
            # dense path: a 1x1 conv is a channel matmul
            return (
                jnp.einsum(
                    "...c,co->...o", x, kernel[0, 0].astype(self.dtype)
                )
                + bias.astype(self.dtype)
            )
        idx = jnp.clip(labels, 0, self.features - 1)
        wsel = jnp.transpose(kernel[0, 0])[idx].astype(x.dtype)  # (..., C)
        bsel = bias[idx].astype(jnp.float32)
        return (
            jnp.einsum("...hwc,...c->...hw", x, wsel).astype(jnp.float32)
            + bsel[..., None, None]
        ).astype(x.dtype)


class FCNMaskHead(nn.Module):
    cfg: MaskHeadConfig
    with_conv_res: bool = False  # HTC information flow
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_feat=None, return_feat: bool = False,
                 labels=None):
        """x (..., S, S, C) roi feats -> mask logits (..., 2S, 2S, num_fg).

        With `labels` (int32, x's leading dims, 0-based fg class), returns
        only the selected class's logits (..., 2S, 2S): the final 1x1 conv
        collapses to a per-roi gathered dot. At LVIS scale this removes a
        (B, M, 2S, 2S, 1230) tensor — ~4.6 GB and ~1.2 TFLOP per batch-8
        step — that the dense conv materializes just to throw away all but
        one channel per roi (gradients are identical: unselected channels
        carry zero cotangent either way).
        """
        c = self.cfg
        if res_feat is not None:
            # conv_res maps the previous stage's feature onto this input's
            # channel count (htc_mask_head.py conv_res; equal in real configs)
            res = nn.Conv(
                x.shape[-1], (1, 1), dtype=self.dtype, name="conv_res"
            )(res_feat)
            x = x + res
        for i in range(c.num_convs):
            x = nn.Conv(
                c.conv_out_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                kernel_init=nn.initializers.he_normal(),
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        feat = x
        x = nn.ConvTranspose(
            c.conv_out_channels,
            (2, 2),
            strides=(2, 2),
            dtype=self.dtype,
            kernel_init=nn.initializers.he_normal(),
            name="upsample",
        )(x)
        x = nn.relu(x)
        num_out = 1 if c.class_agnostic else c.num_classes - 1
        conv_logits = _ClassSelect1x1(
            num_out, dtype=self.dtype, name="conv_logits"
        )
        if labels is None or c.class_agnostic:
            logits = conv_logits(x)
        else:
            logits = conv_logits(x, labels=labels)
        if return_feat:
            return logits, feat
        return logits


def mask_head_loss(
    mask_logits: jnp.ndarray,  # (N, M, M, num_fg) or (N, M, M) preselected
    mask_targets: jnp.ndarray,  # (N, M, M) binary
    labels: jnp.ndarray,  # (N,) 1-based gt class (0 = bg)
    pos_mask: jnp.ndarray,  # (N,) bool
    class_agnostic: bool = False,
    preselected: bool = False,
) -> jnp.ndarray:
    """Binary CE on the target-class mask slice, averaged over positives
    (fcn_mask_head.py:109-123; avg by pos count, each mask contributing its
    mean pixel loss). `preselected` marks logits already gathered to the
    target class by the head's `labels` path."""
    if preselected:
        sel = mask_logits
    elif class_agnostic:
        sel = mask_logits[..., 0]
    else:
        idx = jnp.clip(labels - 1, 0, mask_logits.shape[-1] - 1)
        sel = jnp.take_along_axis(
            mask_logits, idx[:, None, None, None], axis=-1
        )[..., 0]
    # per-roi mean pixel BCE, then mean over positives
    logits = sel.astype(jnp.float32)
    bce = (
        jnp.maximum(logits, 0)
        - logits * mask_targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    per = bce.mean(axis=(1, 2))
    denom = jnp.maximum(jnp.sum(pos_mask), 1.0)
    return jnp.sum(per * pos_mask) / denom

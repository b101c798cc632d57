"""ResNet / ResNeXt backbone in flax.linen, NHWC, bf16-friendly.

Capability parity with /root/reference/mmdet/models/backbones/resnet.py and
resnext.py (torchvision-style bottlenecks, style='pytorch': stride-2 on the
3x3 conv; groups/base_width for ResNeXt variants), redesigned for TPU:

- NHWC layout (XLA's preferred conv layout on TPU).
- BatchNorm always uses running statistics (`norm_eval=True` in every
  reference config, resnet.py:483-494): implemented as a frozen-statistics
  affine BN whose mean/var live in the `batch_stats` collection and are
  never updated. Scale/bias remain trainable parameters; `frozen_stages`
  is enforced by the optimizer parameter mask (parallel/optim.py), matching
  tools/train.py's requires_grad freezing rather than module surgery.
- Stage channel plan: 64*e, 128*e, 256*e, 512*e with expansion e=4
  (Bottleneck) — depths 50/101/152 supported; ResNeXt via groups>1.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ARCH_SETTINGS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BN with frozen running stats (mmdet norm_eval semantics)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )
        inv = scale * jax.lax.rsqrt(var.value + self.epsilon)
        shift = bias - mean.value * inv
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int  # base width of the block (64/128/256/512)
    stride: int = 1
    groups: int = 1
    base_width: int = 4
    use_dcn: bool = False  # deformable conv2 (HTC-DCN: dconv c3-c5)
    # shipped DCN configs are v1 (gs_htc_dconv_*: dcn=dict(modulated=False))
    dcn_modulated: bool = False
    # deform-conv groups (reference reads dcn.get('groups', 1) — resnext.py);
    # 0 => follow `groups` (the shipped X101 config has both at 64)
    dcn_groups: int = 0
    dcn_shift_window: int = 0  # see ops/deform_conv.py _shift_window_cols
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        expansion = 4
        if self.groups == 1:
            width = self.planes
        else:  # ResNeXt width rule (resnext.py make_res_layer)
            width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * expansion

        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(width, name="bn1")(y)
        y = nn.relu(y)
        # style='pytorch': stride on the 3x3
        if self.use_dcn:
            from ..ops.deform_conv import DeformConv

            # parity: the grouped 3x3 stays grouped under DCN
            # (resnext.py:74-83 passes groups into the deform conv op)
            y = DeformConv(
                width,
                kernel_size=3,
                stride=self.stride,
                padding=1,
                modulated=self.dcn_modulated,
                groups=self.dcn_groups or self.groups,
                shift_window=self.dcn_shift_window,
                dtype=self.dtype,
                name="conv2",
            )(y)
        else:
            y = nn.Conv(
                width,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                use_bias=False,
                feature_group_count=self.groups,
                dtype=self.dtype,
                name="conv2",
            )(y)
        y = FrozenBatchNorm(width, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(out_ch, name="bn3")(y)

        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(
                out_ch,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    depth: int = 50
    groups: int = 1  # >1 => ResNeXt
    base_width: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = False
    dcn_groups: int = 0  # 0 => follow `groups`
    dcn_shift_window: int = 0
    remat: bool = False  # rematerialize blocks (activation checkpointing)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        blocks = ARCH_SETTINGS[self.depth]
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        for stage, num_blocks in enumerate(blocks):
            planes = 64 * (2**stage)
            stride = 1 if stage == 0 else 2
            for b in range(num_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    groups=self.groups,
                    base_width=self.base_width,
                    use_dcn=self.dcn_stages[stage],
                    dcn_modulated=self.dcn_modulated,
                    dcn_groups=self.dcn_groups,
                    dcn_shift_window=self.dcn_shift_window,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
        return outs

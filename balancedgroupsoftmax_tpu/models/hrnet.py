"""HRNet backbone + HRFPN neck.

Parity: /root/reference/mmdet/models/backbones/hrnet.py (multi-resolution
parallel branches with repeated fusion; W18/W32/W40 arrangements) and
mmdet/models/necks/hrfpn.py (concat-upsampled branches -> 1x1 conv ->
avg-pooled pyramid). NHWC, frozen-BN like resnet.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fpn import upsample_nearest_2x
from .resnet import Bottleneck, FrozenBatchNorm

# (num_modules, num_blocks, channels) per stage for each arrangement
HRNET_ARCH = {
    "w18": dict(
        stage2=(1, (4, 4), (18, 36)),
        stage3=(4, (4, 4, 4), (18, 36, 72)),
        stage4=(3, (4, 4, 4, 4), (18, 36, 72, 144)),
    ),
    "w32": dict(
        stage2=(1, (4, 4), (32, 64)),
        stage3=(4, (4, 4, 4), (32, 64, 128)),
        stage4=(3, (4, 4, 4, 4), (32, 64, 128, 256)),
    ),
    "w40": dict(
        stage2=(1, (4, 4), (40, 80)),
        stage3=(4, (4, 4, 4), (40, 80, 160)),
        stage4=(3, (4, 4, 4, 4), (40, 80, 160, 320)),
    ),
}


class BasicBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        if x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            identity = FrozenBatchNorm(self.features, name="down_bn")(identity)
        return nn.relu(y + identity)


class HRModule(nn.Module):
    channels: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        n = len(self.channels)
        # per-branch blocks
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks[i]):
                x = BasicBlock(self.channels[i], dtype=self.dtype,
                               name=f"branch{i}_block{b}")(x)
            ys.append(x)
        # full fusion
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                y = ys[j]
                if j > i:  # upsample lower-res branch
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"fuse{i}_{j}_conv")(y)
                    y = FrozenBatchNorm(self.channels[i], name=f"fuse{i}_{j}_bn")(y)
                    for _ in range(j - i):
                        y = upsample_nearest_2x(y)
                elif j < i:  # downsample higher-res branch
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = nn.Conv(ch, (3, 3), strides=(2, 2),
                                    padding=[(1, 1)] * 2, use_bias=False,
                                    dtype=self.dtype,
                                    name=f"fuse{i}_{j}_down{k}_conv")(y)
                        y = FrozenBatchNorm(ch, name=f"fuse{i}_{j}_down{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    arch: str = "w32"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        cfg = HRNET_ARCH[self.arch]
        # stem: two stride-2 convs
        for i in (1, 2):
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                        use_bias=False, dtype=self.dtype, name=f"stem_conv{i}")(x)
            x = FrozenBatchNorm(64, name=f"stem_bn{i}")(x)
            x = nn.relu(x)
        # stage 1: 4 bottlenecks at 64 planes -> 256 ch
        for b in range(4):
            x = Bottleneck(planes=64, stride=1, dtype=self.dtype,
                           name=f"layer1_block{b}")(x)

        branches = [x]
        for stage_idx, key in enumerate(("stage2", "stage3", "stage4")):
            num_modules, num_blocks, channels = cfg[key]
            # transition: adapt existing branches + create the new one
            new_branches = []
            for i, ch in enumerate(channels):
                if i < len(branches):
                    b = branches[i]
                    if b.shape[-1] != ch:
                        b = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2,
                                    use_bias=False, dtype=self.dtype,
                                    name=f"t{stage_idx}_branch{i}_conv")(b)
                        b = FrozenBatchNorm(ch, name=f"t{stage_idx}_branch{i}_bn")(b)
                        b = nn.relu(b)
                    new_branches.append(b)
                else:
                    b = nn.Conv(ch, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                                use_bias=False, dtype=self.dtype,
                                name=f"t{stage_idx}_new{i}_conv")(branches[-1])
                    b = FrozenBatchNorm(ch, name=f"t{stage_idx}_new{i}_bn")(b)
                    new_branches.append(nn.relu(b))
            branches = new_branches
            for m in range(num_modules):
                branches = HRModule(
                    tuple(channels), tuple(num_blocks), dtype=self.dtype,
                    name=f"{key}_module{m}",
                )(branches)
        return branches


class HRFPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        size = (inputs[0].shape[-3], inputs[0].shape[-2])
        ups = [inputs[0]]
        for f in inputs[1:]:
            g = f
            while (g.shape[-3], g.shape[-2]) != size:
                g = upsample_nearest_2x(g)
            ups.append(g)
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="reduce")(x)
        outs = []
        y = x
        for i in range(self.num_outs):
            o = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"fpn{i}")(y)
            outs.append(o)
            if i < self.num_outs - 1:
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        return tuple(outs)

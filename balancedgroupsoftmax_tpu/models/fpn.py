"""Feature Pyramid Network in flax.linen, NHWC.

Parity: /root/reference/mmdet/models/necks/fpn.py — lateral 1x1 convs,
top-down nearest-neighbour x2 upsampling, 3x3 output convs, and (for
num_outs > num inputs without extra convs) stride-2 max-pool extra levels
(fpn.py:152-168). No norm, no activation — matching the LVIS configs.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (2H, 2W) nearest-neighbour, NHWC batch-free or batched."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = jnp.repeat(x, 2, axis=h_axis)
    return jnp.repeat(x, 2, axis=w_axis)


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        num_ins = len(inputs)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(num_ins - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest_2x(laterals[i])
        outs = [
            nn.Conv(
                self.out_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name=f"fpn{i}",
            )(laterals[i])
            for i in range(num_ins)
        ]
        # extra levels: stride-2 max pool on the last output (fpn.py:158-160)
        for _ in range(self.num_outs - num_ins):
            x = outs[-1]
            outs.append(
                nn.max_pool(x, (1, 1), strides=(2, 2), padding="VALID")
            )
        return tuple(outs)

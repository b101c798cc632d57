"""Pallas TPU kernel: batched per-class greedy NMS.

Replaces the XLA fixpoint in ops/nms.py for the hot 1230-class inference
path (and the reference's nms_kernel.cu). The XLA version re-reads the
(C, K, K) adjacency from HBM on every while-loop round; here each grid step
keeps a (BLK, K, K) IoU block resident in VMEM and runs the suppression
fixpoint entirely on-chip — HBM traffic drops to the boxes in and the keep
mask out.

Contract (same as ops/nms.py `one_class` over lax.top_k output):
- box coordinates as four (G, K) arrays, scores descending per row,
  invalid slots masked via `valid` (G, K);
- returns keep (G, K) bool — exact greedy NMS per row (+1 IoU convention).

K pads to a lane multiple (128*n); G pads to the row block size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_block_kernel(iou_thr, x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref):
    # refs are (BLK, 1, K): the unit middle dim keeps the row-block size out
    # of the tiled (last two) dims so any BLK is legal
    x1 = x1_ref[:, 0, :]  # (BLK, K)
    y1 = y1_ref[:, 0, :]
    x2 = x2_ref[:, 0, :]
    y2 = y2_ref[:, 0, :]
    vf = valid_ref[:, 0, :].astype(jnp.float32)  # 32-bit before dim inserts
    blk, k = vf.shape

    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    ix1 = jnp.maximum(x1[:, :, None], x1[:, None, :])
    iy1 = jnp.maximum(y1[:, :, None], y1[:, None, :])
    ix2 = jnp.minimum(x2[:, :, None], x2[:, None, :])
    iy2 = jnp.minimum(y2[:, :, None], y2[:, None, :])
    iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih
    union = area[:, :, None] + area[:, None, :] - inter
    iou = inter / jnp.maximum(union, 1e-6)

    row = jax.lax.broadcasted_iota(jnp.int32, (blk, k, k), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, k, k), 2)
    adj = (
        (iou > iou_thr).astype(jnp.float32)
        * (row < col).astype(jnp.float32)  # higher-scored suppresses later
        * vf[:, :, None]
        * vf[:, None, :]
    )

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        # suppressed[j] = any_i keep[i] & adj[i, j]
        suppressed = jnp.max(keep[:, :, None] * adj, axis=1)
        new_keep = jnp.where(suppressed > 0.0, 0.0, vf)
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(cond, body, (vf, jnp.asarray(True)))
    keep_ref[:, 0, :] = keep.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iou_thr", "block", "interpret"))
def nms_keep_batched(
    boxes: jnp.ndarray,  # (G, K, 4) f32, score-descending rows
    valid: jnp.ndarray,  # (G, K) bool
    iou_thr: float,
    block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    g, k = valid.shape
    kp = -(-k // 128) * 128  # lane-align K
    # fit the (block, K, K) iou+adj workspace in scoped VMEM (~8MB budget)
    block = max(1, min(block, int(8e6 // (kp * kp * 8))))
    gp = -(-g // block) * block
    coords = []
    for i in range(4):
        coords.append(
            jnp.zeros((gp, 1, kp), jnp.float32).at[:g, 0, :k].set(
                boxes[..., i].astype(jnp.float32)
            )
        )
    valid_p = jnp.zeros((gp, 1, kp), jnp.int32).at[:g, 0, :k].set(
        valid.astype(jnp.int32)
    )

    kernel = functools.partial(_nms_block_kernel, iou_thr)
    spec = pl.BlockSpec((block, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    keep = pl.pallas_call(
        kernel,
        grid=(gp // block,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((gp, 1, kp), jnp.int32),
        interpret=interpret,
    )(*coords, valid_p)
    return keep[:g, 0, :k] > 0

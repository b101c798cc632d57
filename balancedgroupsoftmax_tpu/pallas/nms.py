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


def _nms_block_kernel(
    iou_thr, rp, x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref
):
    # refs are (BLK, 1, K): the unit middle dim keeps the row-block size out
    # of the tiled (last two) dims so any BLK is legal
    x1 = x1_ref[:, 0, :]  # (BLK, K)
    y1 = y1_ref[:, 0, :]
    x2 = x2_ref[:, 0, :]
    y2 = y2_ref[:, 0, :]
    vf = valid_ref[:, 0, :].astype(jnp.float32)  # 32-bit before dim inserts
    _fixpoint_keep(iou_thr, rp, x1, y1, x2, y2, vf, keep_ref)


def _fixpoint_keep(iou_thr, rp, x1, y1, x2, y2, vf, keep_ref):
    blk, k = vf.shape

    # Suppressor (row) dim only needs sublane alignment, not the lane
    # padding of K (300 -> 384): building the IoU block at (RP=304, K)
    # instead of (K, K) cuts ~21% of the VPU work that dominates this
    # kernel. Rows >= the true candidate count have valid=0 and zero
    # adjacency, so padding the matvec LHS back to K with their (dead)
    # keep values is exact.
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    # two-step slice+expand: the fused [:, :rp, None] getitem lowers via
    # jnp's gather path, which Mosaic rejects
    rows = lambda a: a[:, :rp][:, :, None]
    x1r = rows(x1)
    y1r = rows(y1)
    x2r = rows(x2)
    y2r = rows(y2)
    ix1 = jnp.maximum(x1r, x1[:, None, :])
    iy1 = jnp.maximum(y1r, y1[:, None, :])
    ix2 = jnp.minimum(x2r, x2[:, None, :])
    iy2 = jnp.minimum(y2r, y2[:, None, :])
    iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
    ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
    inter = iw * ih
    union = rows(area) + area[:, None, :] - inter
    iou = inter / jnp.maximum(union, 1e-6)

    row = jax.lax.broadcasted_iota(jnp.int32, (blk, rp, k), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, rp, k), 2)
    # bf16 0/1 adjacency: exact, halves the resident workspace, and feeds
    # the MXU natively for the fixpoint matvecs below
    adj = (
        (iou > iou_thr).astype(jnp.bfloat16)
        * (row < col).astype(jnp.bfloat16)  # higher-scored suppresses later
        * rows(vf).astype(jnp.bfloat16)
        * vf[:, None, :].astype(jnp.bfloat16)
    )

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        keep, _ = state
        # suppressed[j] = sum_i keep[i] * adj[i, j] >= 1 — a batched
        # (1,RP)x(RP,K) matvec on the MXU instead of a VPU masked-max sweep
        # (exact: 0/1 bf16 operands, f32 accumulation)
        sup = jax.lax.dot_general(
            keep[:, :rp][:, None, :].astype(jnp.bfloat16),
            adj,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]
        new_keep = jnp.where(sup > 0.5, 0.0, vf)
        return new_keep, jnp.any(new_keep != keep)

    keep, _ = jax.lax.while_loop(cond, body, (vf, jnp.asarray(True)))
    keep_ref[:, 0, :] = keep.astype(jnp.int32)


def _nms_tiled_kernel(
    iou_thr,
    tile,
    x1r_ref,  # (1, K) row layout (for candidate-tile lane slices)
    y1r_ref,
    x2r_ref,
    y2r_ref,
    vr_ref,
    col_ref,  # (K, 8) column layout [x1 y1 x2 y2 v 0 0 0] (suppressor rows)
    keep_ref,  # (1, K) f32 out — read back for cross-tile suppression
):
    k = x1r_ref.shape[1]
    n_tiles = k // tile

    x1c = col_ref[:, 0:1]  # (K, 1)
    y1c = col_ref[:, 1:2]
    x2c = col_ref[:, 2:3]
    y2c = col_ref[:, 3:4]
    vc = col_ref[:, 4:5]
    area_c = (x2c - x1c + 1.0) * (y2c - y1c + 1.0)  # (K, 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (k, tile), 0)  # global i

    keep_ref[:, :] = jnp.zeros((1, k), jnp.float32)

    def tile_body(t, carry):
        s = t * tile
        cx1 = x1r_ref[:, pl.ds(s, tile)]  # (1, tile)
        cy1 = y1r_ref[:, pl.ds(s, tile)]
        cx2 = x2r_ref[:, pl.ds(s, tile)]
        cy2 = y2r_ref[:, pl.ds(s, tile)]
        cv = vr_ref[:, pl.ds(s, tile)]
        area_t = (cx2 - cx1 + 1.0) * (cy2 - cy1 + 1.0)  # (1, tile)

        # adjT[i, j] = suppressor i (global, any tile) overlaps tile box j
        ix1 = jnp.maximum(x1c, cx1)  # (K, tile)
        iy1 = jnp.maximum(y1c, cy1)
        ix2 = jnp.minimum(x2c, cx2)
        iy2 = jnp.minimum(y2c, cy2)
        iw = jnp.maximum(ix2 - ix1 + 1.0, 0.0)
        ih = jnp.maximum(iy2 - iy1 + 1.0, 0.0)
        inter = iw * ih
        union = area_c + area_t - inter
        iou = inter / jnp.maximum(union, 1e-6)
        col_idx = s + jax.lax.broadcasted_iota(jnp.int32, (k, tile), 1)
        adj_t = (
            (iou > iou_thr).astype(jnp.float32)
            * (row_idx < col_idx).astype(jnp.float32)
            * vc
            * cv
        )  # (K, tile)

        # cross-tile: earlier tiles' keeps are final; later rows are 0 in
        # keep_ref so the matmul ignores them. (1,K) @ (K,tile) on the MXU.
        kept_prev = keep_ref[:, :]  # (1, K)
        cross = jax.lax.dot_general(
            kept_prev,
            adj_t,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, tile)
        base = cv * (cross < 0.5).astype(jnp.float32)  # valid & not cross-suppressed

        # within-tile adjacency recomputed from column-layout ref slices
        # (Mosaic can't dynamic_slice a value, but ref loads take pl.ds);
        # the extra (tile, tile) IoU is small next to the (K, tile) strip.
        wx1 = col_ref[pl.ds(s, tile), 0:1]  # (tile, 1)
        wy1 = col_ref[pl.ds(s, tile), 1:2]
        wx2 = col_ref[pl.ds(s, tile), 2:3]
        wy2 = col_ref[pl.ds(s, tile), 3:4]
        wv = col_ref[pl.ds(s, tile), 4:5]
        warea = (wx2 - wx1 + 1.0) * (wy2 - wy1 + 1.0)
        wix1 = jnp.maximum(wx1, cx1)
        wiy1 = jnp.maximum(wy1, cy1)
        wix2 = jnp.minimum(wx2, cx2)
        wiy2 = jnp.minimum(wy2, cy2)
        wiw = jnp.maximum(wix2 - wix1 + 1.0, 0.0)
        wih = jnp.maximum(wiy2 - wiy1 + 1.0, 0.0)
        winter = wiw * wih
        wiou = winter / jnp.maximum(warea + area_t - winter, 1e-6)
        wrow = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        wcol = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        adj_w = (
            (wiou > iou_thr).astype(jnp.float32)
            * (wrow < wcol).astype(jnp.float32)
            * wv
            * cv
        )  # (tile, tile) within-tile, i<j only

        def cond(state):
            _, changed = state
            return changed

        def body(state):
            kp, _ = state
            sup = jax.lax.dot_general(
                kp,
                adj_w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1, tile)
            new_kp = base * (sup < 0.5).astype(jnp.float32)
            return new_kp, jnp.any(new_kp != kp)

        kp, _ = jax.lax.while_loop(cond, body, (base, jnp.asarray(True)))
        keep_ref[:, pl.ds(s, tile)] = kp
        return carry

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("iou_thr", "tile", "interpret"))
def nms_keep_tiled(
    boxes: jnp.ndarray,  # (G, K, 4) f32, score-descending rows
    valid: jnp.ndarray,  # (G, K) bool
    iou_thr: float,
    tile: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tile-sequential greedy NMS for large K (train-time RPN, K=2000).

    The full-adjacency kernel needs a (K, K) workspace in VMEM and stops
    scaling near K~1280. Here each grid program walks one row's boxes in
    score order, `tile` at a time: suppression by all earlier (finalized)
    tiles is one (1,K)x(K,tile) MXU matmul against the keep vector, and
    only the (tile, tile) within-tile chain needs a fixpoint — so rounds
    are bounded by within-tile chain depth and VMEM by the (K, tile) strip.
    Exact greedy semantics (+1 IoU convention), same contract as
    nms_keep_batched.
    """
    g, k = valid.shape
    if tile == 0:
        # ~4 live (KP, tile) f32 strips must fit the ~16MB scoped-VMEM
        # budget; 256 measures fastest at K=2000 (4.99 vs 6.45 ms @128)
        kp128 = -(-k // 128) * 128
        tile = 256 if 4 * kp128 * 256 * 4 <= 12e6 else 128
    assert tile % 128 == 0, (
        f"tile must be a multiple of 128 (got {tile}); otherwise the "
        f"128-rounded KP is not divisible by tile and trailing boxes "
        f"would silently never be processed"
    )
    kp = -(-k // tile) * tile
    kp = -(-kp // 128) * 128

    def pad_row(x):  # (G, K) -> (G, 1, KP)
        return jnp.zeros((g, 1, kp), jnp.float32).at[:, 0, :k].set(
            x.astype(jnp.float32)
        )

    coords_r = [pad_row(boxes[..., i]) for i in range(4)] + [pad_row(valid)]
    # single packed column-layout input: 5 separate (KP, 1) arrays would
    # each pad to a full 128-lane tile in VMEM; one (KP, 8) costs 1/5th
    col = jnp.zeros((g, kp, 8), jnp.float32)
    col = col.at[:, :k, :4].set(boxes.astype(jnp.float32))
    col = col.at[:, :k, 4].set(valid.astype(jnp.float32))

    kernel = functools.partial(_nms_tiled_kernel, iou_thr, tile)
    # leading None squeezes the grid dim: kernel refs are (1, KP) / (KP, 8)
    row_spec = pl.BlockSpec((None, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((None, kp, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    keep = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[row_spec] * 5 + [col_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, kp), jnp.float32),
        interpret=interpret,
    )(*coords_r, col)
    return keep[:, 0, :k] > 0.5


def _keep_from_coords(coords, valid, iou_thr, block, interpret):
    """Shared tail: coords is a list of four (G, K) f32 arrays."""
    g, k = valid.shape
    kp = -(-k // 128) * 128  # lane-align K (columns)
    rp = min(-(-k // 8) * 8, kp)  # suppressor rows: sublane-align only
    # fit the (block, RP, K) f32 iou + bf16 adj workspace (~6B/elem) in
    # scoped VMEM (~10MB budget)
    block = max(1, min(block, int(10e6 // (rp * kp * 6))))
    gp = -(-g // block) * block
    coords_p = [
        jnp.zeros((gp, 1, kp), jnp.float32).at[:g, 0, :k].set(c)
        for c in coords
    ]
    valid_p = jnp.zeros((gp, 1, kp), jnp.int32).at[:g, 0, :k].set(
        valid.astype(jnp.int32)
    )

    kernel = functools.partial(_nms_block_kernel, iou_thr, rp)
    spec = pl.BlockSpec((block, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    keep = pl.pallas_call(
        kernel,
        grid=(gp // block,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((gp, 1, kp), jnp.int32),
        interpret=interpret,
    )(*coords_p, valid_p)
    return keep[:g, 0, :k] > 0


@functools.partial(jax.jit, static_argnames=("iou_thr", "block", "interpret"))
def nms_keep_batched(
    boxes: jnp.ndarray,  # (G, K, 4) f32, score-descending rows
    valid: jnp.ndarray,  # (G, K) bool
    iou_thr: float,
    block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    coords = [boxes[..., i].astype(jnp.float32) for i in range(4)]
    return _keep_from_coords(coords, valid, iou_thr, block, interpret)


@functools.partial(jax.jit, static_argnames=("iou_thr", "block", "interpret"))
def nms_keep_batched_coords(
    coords: jnp.ndarray,  # (G, 4, K) f32 [x1 y1 x2 y2] rows, score-desc cols
    valid: jnp.ndarray,  # (G, K) bool
    iou_thr: float,
    block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """nms_keep_batched for coordinate-plane input ((G,4,K) instead of
    (G,K,4)) — the layout the pallas gather kernel produces; slicing rows
    here is a well-tiled read where boxes[..., i] on a minor-dim-4 array
    is a 32x-lane-waste one."""
    cs = [coords[:, i, :].astype(jnp.float32) for i in range(4)]
    return _keep_from_coords(cs, valid, iou_thr, block, interpret)


def _nms_gathered_kernel(
    iou_thr, rp, block, planes_ref, idx_ref, valid_ref, keep_ref, cand_ref
):
    """Gather-fused variant of _nms_block_kernel: candidates are selected
    from coordinate planes by an in-VMEM one-hot matmul (bit-exact bf16x3,
    see pallas/gather.py) instead of arriving pre-gathered — one kernel
    launch and no HBM round-trip for the (G, 4, K) candidate array."""
    np_ = planes_ref.shape[-1]
    kp = idx_ref.shape[-1]
    coords = []
    for j in range(block):
        pj = planes_ref[j]  # (4, NP) f32
        idx = idx_ref[j, 0, :]  # (KP,)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (np_, kp), 0) == idx[None, :]
        ).astype(jnp.bfloat16)
        hi = pj.astype(jnp.bfloat16)
        r1 = pj - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        out = None
        for term in (hi, mid, lo):
            d = jax.lax.dot_general(
                term, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = d if out is None else out + d
        cand_ref[j] = out  # (4, KP)
        coords.append(out)

    stacked = jnp.stack(coords)  # (BLK, 4, KP) f32
    x1 = stacked[:, 0, :]
    y1 = stacked[:, 1, :]
    x2 = stacked[:, 2, :]
    y2 = stacked[:, 3, :]
    vf = valid_ref[:, 0, :].astype(jnp.float32)
    _fixpoint_keep(iou_thr, rp, x1, y1, x2, y2, vf, keep_ref)


@functools.partial(jax.jit, static_argnames=("iou_thr", "block", "interpret"))
def nms_keep_gathered(
    planes: jnp.ndarray,  # (G, 4, N) f32 coordinate planes
    idx: jnp.ndarray,  # (G, K) i32 candidate indices, score-descending
    valid: jnp.ndarray,  # (G, K) bool
    iou_thr: float,
    block: int = 8,
    interpret: bool = False,
):
    """Fused candidate-gather + greedy NMS. Returns (keep (G, K) bool,
    cand (G, 4, K) f32) — cand[g, :, k] = planes[g, :, idx[g, k]]."""
    g, k = valid.shape
    _, r, n = planes.shape
    kp = -(-k // 128) * 128
    rp = min(-(-k // 8) * 8, kp)
    np_ = -(-n // 128) * 128
    block = max(1, min(block, int(8e6 // (rp * kp * 6))))
    gp = -(-g // block) * block
    if np_ != n or gp != g:
        planes = jnp.pad(
            planes, ((0, gp - g), (0, 0), (0, np_ - n))
        )
    idx_p = jnp.zeros((gp, 1, kp), jnp.int32).at[:g, 0, :k].set(
        idx.astype(jnp.int32)
    )
    valid_p = jnp.zeros((gp, 1, kp), jnp.int32).at[:g, 0, :k].set(
        valid.astype(jnp.int32)
    )

    kernel = functools.partial(_nms_gathered_kernel, iou_thr, rp, block)
    keep, cand = pl.pallas_call(
        kernel,
        grid=(gp // block,),
        in_specs=[
            pl.BlockSpec((block, r, np_), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, 1, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, r, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gp, 1, kp), jnp.int32),
            jax.ShapeDtypeStruct((gp, r, kp), jnp.float32),
        ],
        interpret=interpret,
    )(planes.astype(jnp.float32), idx_p, valid_p)
    return keep[:g, 0, :k] > 0, cand[:g, :, :k]

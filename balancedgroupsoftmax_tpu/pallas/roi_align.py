"""Pallas TPU kernel: multi-level RoIAlign via windowed separable matmuls.

Replaces the reference's roi_align_kernel.cu for the inference hot path.
The XLA gather formulation (ops/roi_align.py) is dispatch-bound on TPU
(millions of (2, C) slices); this kernel instead:

1. routes each roi to its FPN level host-side (map_roi_levels) and picks an
   *orientation*: portrait rois (taller than wide on their level) sample
   from a transposed copy of the pyramid, so every roi sees a landscape
   window. With the level routing bounding cell area at ~784, a
   (WIN_H=32, WIN_W=80) window then covers every roi with aspect ratio up
   to ~8 exactly (both-spans>31 would need area>961); only ultra-thin
   outliers clamp their outermost samples to the window edge;
2. DMAs the (WIN_H, WIN_W, C) window from the chosen level buffer (HBM)
   into VMEM — one contiguous strided copy per roi;
3. expresses bilinear sampling as two small MXU matmuls: bilinear
   interpolation is separable, samples = Wy @ window @ Wx^T, where the
   (OS, WIN) interpolation matrices carry two weights per row built
   in-kernel with the CUDA kernel's exact boundary rules
   (roi_align_kernel.cu bilinear_interpolate);
4. averages the sample grid into the (out, out, C) output.

Training uses a custom VJP. The default backward ("dense") is the
transpose of the separable-interpolation forward taken in GLOBAL level
coordinates — per level, dL = sum_r wy_r^T g_r wx_r as two batched MXU
dot_generals per image, zero scatters — matching the CUDA backward's
weights and boundary rules (roi_align_kernel.cu ROIAlignBackward) with a
different summation order. Measured on-chip (BENCHMARKS round 5): full
fwd+bwd 842 -> 638 ms @16, the roi-VJP+neck backward 432 -> 252 ms.
"scan" (sequential windowed read-modify-write, collision-free) and
"scatter" (chunked scatter_add) remain selectable via bwd_mode.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.roi_align import map_roi_levels

# Module-level DEFAULTS for the kernel variants below. These are read only
# when the corresponding explicit argument is None; pass the argument to
# force a retrace (they are static/nondiff args, so a changed value is a
# new jit cache key — toggling a global after tracing silently does
# nothing, the round-4 advisor foot-gun).
#
# PRECOMPUTED_INTERP: build the per-roi (os, WIN) interpolation matrices
# batched in XLA and stream them into the kernel as pipelined VMEM inputs,
# instead of per-roi VPU construction on the Mosaic side (an experiment
# against the kernel's measured per-roi fixed-latency floor; ~3 KB/roi
# extra HBM traffic).
PRECOMPUTED_INTERP = False

# Backward strategy (BWD_MODE):
#   "dense2"  — per-level batched matmuls in GLOBAL level coordinates,
#               rows-first: Q = wy^T g (batched), then ONE two-dim
#               contraction over (roi, j) — no (R*os, W*C) transpose at
#               all, intermediate H_l-sized instead of W_l-sized. On the
#               chip (round 5): full fwd+bwd 638.0 -> 510.0 ms @16, roi
#               VJP + neck bwd 252.9 -> 125.0 ms, fwd+bwd MFU 17.6 ->
#               22.0% — the v1 dense backward's explicit transpose was
#               half its cost.
#   "dense"   — the v1 contraction order: P = wx @ g then a transposed
#               (R*os, W*C) @ matmul. dL_l = sum_r wy_r^T g_r wx_r either
#               way; rois not on level l contribute exact zeros.
#   "scan"    — per-roi half-canvas lax.scan (sequential read-modify-
#               write, collision-free by construction).
#   "scatter" — chunked jax.lax.scatter_add of batched window gradients
#               (two big MXU einsums per chunk + window-granular scatter).
BWD_MODE = "dense2"
BWD_SCATTER_CHUNK = 256

WIN_H = 32  # short-axis window cells
HALF_H = WIN_H // 2  # row-half DMA granularity (short rois skip the bottom)
WIN_W = 80  # long-axis window cells (full; covers aspect ratios to ~8)
WIN_W_LO = 40  # first width half: covers the common aspect range alone
ROIS_PER_BLOCK = 8  # rois per grid step for out_size<=7 (see _rois_per_block)


def _rois_per_block(out_size: int, itemsize: int) -> int:
    """Rois per grid step. More rois per block = more DMAs in flight (the
    kernel is DMA-bound; 4->8 outstanding windows measured 52.6->46.3 ms at
    B16/R1000, 8->10 another ~1% — not worth the VMEM). The window scratch
    is rb * WIN_H * WIN_W * C * itemsize (~10.4MB at rb=8/bf16/C=256), so
    f32 pyramids (the train-time path) and the mask branch (out_size 14,
    4x the f32 output block) each halve rb to stay inside the ~16MB VMEM
    scoped budget."""
    rb = ROIS_PER_BLOCK if itemsize <= 2 else ROIS_PER_BLOCK // 2
    return rb if out_size <= 7 else max(rb // 2, 2)


def _sel_table(idx, values, dtype):
    """Scalar select from a STATIC per-section table (<= 2*num_levels
    entries) — a short where-chain on the scalar core instead of an SMEM
    array, so derivable per-roi data costs no scalar-prefetch budget."""
    out = jnp.asarray(values[0], dtype)
    for i, v in enumerate(values[1:], 1):
        out = jnp.where(idx == i, jnp.asarray(v, dtype), out)
    return out


def _kernel(
    # scalar prefetch (1-D per-roi vectors: 2-D SMEM operands pad the
    # minor dim to 128 and blow the SMEM budget). Everything integral is
    # bit-packed into two words and the per-SECTION geometry (level dims,
    # stacked-row offsets) lives in static where-chain tables, so the
    # budget is 6 x 4B x B*R — batch 32 x 1000 rois = 768KB < 1MB SMEM
    # (13 unpacked vectors were 1.66MB and failed to compile).
    meta1_ref,  # (R,) i32: img (16b) | section (5b) | portrait|wide|tall (3b)
    meta2_ref,  # (R,) i32: y0 in LEVEL coords (16b) | x0 (16b, 8-aligned)
    sh_ref,  # (R,) f32 start_h (oriented frame)
    sw_ref,  # (R,) f32 start_w
    bh_ref,  # (R,) f32 bin_h
    bw_ref,  # (R,) f32 bin_w
    # input (HBM): the stacked (B, sum_sections_H, max_W, C) pyramid
    f,
    *rest,
    out_size: int,
    sample_num: int,
    rb: int,
    row_off: tuple,  # static per-section row offset in the stacked buffer
    sec_h: tuple,  # static per-section ORIENTED level height (f32)
    sec_w: tuple,  # static per-section ORIENTED level width (f32)
    precomputed_interp: bool = False,
):
    if precomputed_interp:
        # interp matrices arrive as pipelined VMEM inputs (built batched in
        # XLA host-graph) instead of per-roi VPU construction in-kernel
        wy_ref, wx_ref, out_ref, win_lo, win_hi, hi_sc, sem = rest
    else:
        wy_ref = wx_ref = None
        out_ref, win_lo, win_hi, hi_sc, sem = rest
    blk = pl.program_id(0)

    # The interp weights of a roi are zero on window rows/cols its samples
    # never touch, so quadrants skipped below may hold STALE data — but a
    # zero weight only cancels FINITE stale values (0 * NaN = NaN). One
    # zero-fill on the first block makes every future stale read finite.
    @pl.when(blk == 0)
    def _():
        win_lo[...] = jnp.zeros_like(win_lo)
        win_hi[...] = jnp.zeros_like(win_hi)

    def window_dma(ri, slot):
        """The (identical) DMA descriptors for roi ri into buffer `slot` —
        reconstructed at start and wait sites. The window moves in up to
        four quadrants (two width halves x two row halves) into CONTIGUOUS
        scratch regions (a partial-width destination inside one wide
        buffer degrades to per-row descriptors): the hi width half only
        for wide-aspect rois, the bottom row half only for tall windows —
        most rois (small objects routed to their FPN level) touch only the
        top-left quadrant, quartering HBM traffic. y0's (level, orientation)
        section row offset comes from the static row_off table, so the
        transfer source is data-independent — no conditional buffer
        dispatch."""
        m1 = meta1_ref[ri]
        m2 = meta2_ref[ri]
        img = m1 & 0xFFFF
        src = (m1 >> 16) & 0x1F
        wide = ((m1 >> 22) & 1) > 0
        tall = ((m1 >> 23) & 1) > 0
        y0 = (m2 & 0xFFFF) + _sel_table(src, row_off, jnp.int32)
        x0 = (m2 >> 16) & 0xFFFF
        x0lo = pl.multiple_of(x0, 8)
        x0hi = pl.multiple_of(x0 + WIN_W_LO, 8)

        def quad(x0q, w, dst, rows0, sem_slot):
            return pltpu.make_async_copy(
                f.at[img, pl.ds(y0 + rows0, HALF_H), pl.ds(x0q, w), :],
                dst.at[slot, pl.ds(rows0, HALF_H)],
                sem.at[slot, sem_slot],
            )

        lo_t = quad(x0lo, WIN_W_LO, win_lo, 0, 0)
        lo_b = quad(x0lo, WIN_W_LO, win_lo, HALF_H, 1)
        hi_t = quad(x0hi, WIN_W - WIN_W_LO, win_hi, 0, 2)
        hi_b = quad(x0hi, WIN_W - WIN_W_LO, win_hi, HALF_H, 3)
        return (lo_t, lo_b, hi_t, hi_b), wide, tall

    # issue all rb window DMAs up front (the DMA engine pipelines them;
    # compute of roi j overlaps the later transfers)
    def for_each_dma(ri, slot, op):
        (lo_t, lo_b, hi_t, hi_b), wide, tall = window_dma(ri, slot)
        op(lo_t)

        @pl.when(tall)
        def _(lo_b=lo_b):
            op(lo_b)

        @pl.when(wide)
        def _(hi_t=hi_t):
            op(hi_t)

        @pl.when(wide & tall)
        def _(hi_b=hi_b):
            op(hi_b)

    for j in range(rb):
        for_each_dma(blk * rb + j, j, lambda d: d.start())

    for j in range(rb):
        r = blk * rb + j
        for_each_dma(r, j, lambda d: d.wait())

        _compute_one_roi(
            r, j, meta1_ref, meta2_ref, sh_ref, sw_ref, bh_ref,
            bw_ref, win_lo, win_hi, hi_sc, out_ref, out_size, sample_num,
            sec_h, sec_w, wy_ref, wx_ref,
        )


def _compute_one_roi(
    r, j, meta1_ref, meta2_ref, sh_ref, sw_ref, bh_ref, bw_ref,
    win_lo, win_hi, hi_sc, out_ref, out_size, sample_num, sec_h, sec_w,
    wy_ref=None, wx_ref=None,
):
    m1 = meta1_ref[r]
    m2 = meta2_ref[r]
    src = (m1 >> 16) & 0x1F
    portrait = ((m1 >> 21) & 1) > 0

    if wy_ref is not None:
        wy = wy_ref[j]  # (os, WIN_H) — precomputed batched in XLA
        wx = wx_ref[j]  # (os, WIN_W)
    else:
        start_h = sh_ref[r]
        start_w = sw_ref[r]
        bin_h = bh_ref[r]
        bin_w = bw_ref[r]
        h_l = _sel_table(src, sec_h, jnp.float32)
        w_l = _sel_table(src, sec_w, jnp.float32)

        idx = jax.lax.broadcasted_iota(jnp.int32, (out_size, 1), 0).astype(
            jnp.float32
        )

        def interp_matrix(start, bin_sz, size_l, origin, win):
            """(out_size, win) separable bilinear weights with the sample_num
            x sample_num average pooling FOLDED IN (pooling commutes with the
            linear interpolation): row k is the mean of the sample_num sample
            rows of bin k. CUDA boundary rules per sample."""
            cols = jax.lax.broadcasted_iota(jnp.int32, (out_size, win), 1).astype(
                jnp.float32
            )
            m_sum = jnp.zeros((out_size, win), jnp.float32)
            for s in range(sample_num):
                pos = start + bin_sz * (idx + (s + 0.5) / sample_num)
                valid = (pos >= -1.0) & (pos <= size_l)
                p = jnp.maximum(pos, 0.0)
                low = jnp.floor(p)
                collapse = low >= size_l - 1.0
                low = jnp.where(collapse, size_l - 1.0, low)
                p_eff = jnp.where(collapse, low, p)
                high = jnp.where(collapse, low, low + 1.0)
                lfrac = p_eff - low
                hfrac = 1.0 - lfrac
                low_w = jnp.clip(low - origin, 0.0, win - 1.0)
                high_w = jnp.clip(high - origin, 0.0, win - 1.0)
                m = hfrac * (cols == low_w) + lfrac * (cols == high_w)
                m_sum = m_sum + jnp.where(valid, m, 0.0)
            return m_sum / sample_num

        y0f = (m2 & 0xFFFF).astype(jnp.float32)  # window origin in LEVEL coords
        x0f = ((m2 >> 16) & 0xFFFF).astype(jnp.float32)
        wy = interp_matrix(start_h, bin_h, h_l, y0f, WIN_H)  # (os, WIN_H)
        wx = interp_matrix(start_w, bin_w, w_l, x0f, WIN_W)  # (os, WIN_W)

    wlo = win_lo[j][...]  # (WIN_H, WIN_W_LO, C), native dtype (bf16 prod)
    c = wlo.shape[-1]
    wdt = wlo.dtype

    # f32 windows (the train-time path) must not silently drop to the
    # MXU's default single-pass bf16 f32-matmul lowering — that costs ~1%
    # relative error on the pooled features; bf16 windows (inference) are
    # unaffected by the precision request.
    prec = (
        jax.lax.Precision.HIGHEST if wdt == jnp.float32 else None
    )

    def half(win, wx_part, win_w):
        # tmp[i, w, c] = sum_h wy[i, h] * win[h, w, c] — matmul in the
        # window's dtype (bf16 MXU at full rate), f32 accumulation; H is
        # the untiled dim, so contracting it first avoids an internal
        # transpose of the (sublane-tiled) W axis. Then
        # out[j, i, c] = sum_w wx[j, w] * tmp[i, w, c].
        tmp = jax.lax.dot_general(
            wy.astype(wdt),
            win.reshape(WIN_H, win_w * c),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).reshape(out_size, win_w, c)
        return jax.lax.dot_general(
            wx_part, tmp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (j, i, c): x-bin, y-bin, C in the ORIENTED frame

    out = half(wlo, wx[:, :WIN_W_LO], WIN_W_LO)
    # The hi half is stale (possibly NaN) scratch for narrow rois — AND
    # streaming its 0.65MB through the MXU dominates the roi's compute, so
    # narrow rois skip the matmuls entirely (not just mask the result):
    # the hi term goes through a small scratch that the narrow branch
    # zero-fills instead (a 50KB VPU store vs an MXU stream).
    wide = ((m1 >> 22) & 1) > 0

    @pl.when(wide)
    def _():
        hi_sc[...] = half(win_hi[j][...], wx[:, WIN_W_LO:], WIN_W - WIN_W_LO)

    @pl.when(jnp.logical_not(wide))
    def _():
        hi_sc[...] = jnp.zeros_like(hi_sc)

    out = out + hi_sc[...]

    # un-orient: landscape needs (y, x); portrait frame's (x, y) is the
    # original (y, x) already
    @pl.when(portrait)
    def _():
        out_ref[j] = out

    @pl.when(jnp.logical_not(portrait))
    def _():
        out_ref[j] = jnp.transpose(out, (1, 0, 2))


def _forward(
    feats: Sequence[jnp.ndarray],  # per level (B, H_l, W_l, C)
    rois: jnp.ndarray,  # (B, R, 4)
    strides: Sequence[int],
    out_size: int,
    sample_num: int,
    finest_scale: int,
    interpret: bool = False,
    precomputed_interp: bool | None = None,
) -> jnp.ndarray:
    if precomputed_interp is None:
        precomputed_interp = PRECOMPUTED_INTERP
    b, r = rois.shape[:2]
    c = feats[0].shape[-1]
    num_levels = len(feats)

    flat_rois = rois.reshape(b * r, 4).astype(jnp.float32)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    lvls = map_roi_levels(flat_rois, num_levels, finest_scale)
    stride_arr = jnp.asarray(np.asarray(strides, np.float32))
    scale = 1.0 / stride_arr[lvls]
    hs = jnp.asarray(np.asarray([f.shape[1] for f in feats], np.int32))
    ws = jnp.asarray(np.asarray([f.shape[2] for f in feats], np.int32))
    h_l = hs[lvls].astype(jnp.float32)
    w_l = ws[lvls].astype(jnp.float32)

    start_w = flat_rois[:, 0] * scale
    start_h = flat_rois[:, 1] * scale
    end_w = (flat_rois[:, 2] + 1.0) * scale
    end_h = (flat_rois[:, 3] + 1.0) * scale
    span_w = jnp.maximum(end_w - start_w, 0.0)
    span_h = jnp.maximum(end_h - start_h, 0.0)
    bin_w = span_w / out_size
    bin_h = span_h / out_size

    portrait = span_h > span_w  # use the transposed pyramid
    # oriented geometry: portrait swaps the roles of y and x
    o_start_h = jnp.where(portrait, start_w, start_h)
    o_start_w = jnp.where(portrait, start_h, start_w)
    o_bin_h = jnp.where(portrait, bin_w, bin_h)
    o_bin_w = jnp.where(portrait, bin_h, bin_w)
    o_h = jnp.where(portrait, w_l, h_l)
    o_w = jnp.where(portrait, h_l, w_l)

    y0 = jnp.clip(
        jnp.floor(o_start_h).astype(jnp.int32),
        0,
        jnp.maximum(o_h.astype(jnp.int32) - WIN_H, 0),
    )
    x0 = jnp.clip(
        jnp.floor(o_start_w).astype(jnp.int32),
        0,
        jnp.maximum(o_w.astype(jnp.int32) - WIN_W, 0),
    )
    # Mosaic requires dynamic offsets in the sublane-tiled dim (W) to be
    # 8-aligned; align down (the window keeps covering the roi start).
    x0 = (x0 // 8) * 8
    src = lvls + jnp.where(portrait, num_levels, 0)
    # does any sample's high cell fall beyond the first width half?
    # max sampled x = start + bin*(os-0.5)/1 -> high cell <= floor(start+span)+1
    end_cell = jnp.floor(o_start_w + o_bin_w * out_size).astype(jnp.int32) + 1
    wide = (end_cell - x0) >= WIN_W_LO
    # same for the bottom row half; includes the edge-clamp case, where the
    # interp collapse writes weight at row size_l-1 - y0 <= end_cell_h - y0
    end_cell_h = jnp.floor(o_start_h + o_bin_h * out_size).astype(jnp.int32) + 1

    # Stack all (level, orientation) sections into ONE HBM buffer, padded
    # to a uniform width: the kernel then needs no data-dependent buffer
    # dispatch (8 conditional DMA starts + waits per roi cost ~1us/roi in
    # scalar-core branches). A roi's window row offset becomes
    # y0 + row_off[section], computed host-side.
    def pad_min(f, min_h, min_w):
        ph = max(min_h - f.shape[1], 0)
        pw = max(min_w - f.shape[2], 0)
        if ph or pw:
            f = jnp.pad(f, ((0, 0), (0, ph), (0, pw), (0, 0)))
        return f

    sections = [pad_min(f, WIN_H, WIN_W) for f in feats] + [
        pad_min(jnp.transpose(f, (0, 2, 1, 3)), WIN_H, WIN_W) for f in feats
    ]
    max_w = max(f.shape[2] for f in sections)
    sections = [pad_min(f, WIN_H, max_w) for f in sections]
    row_off = np.cumsum([0] + [f.shape[1] for f in sections[:-1]]).astype(np.int32)
    stacked = jnp.concatenate(sections, axis=1)
    tall = (end_cell_h - y0) >= HALF_H

    # static per-section geometry (the kernel indexes these by the 5-bit
    # section id instead of burning three more scalar-prefetch vectors):
    # oriented level dims — transposed sections swap H and W
    lvl_h = [float(f.shape[1]) for f in feats]
    lvl_w = [float(f.shape[2]) for f in feats]
    sec_h = tuple(lvl_h + lvl_w)
    sec_w = tuple(lvl_w + lvl_h)
    assert b < (1 << 16) and max(s.shape[1] for s in sections) < (1 << 16)
    assert max_w < (1 << 16) and len(sections) <= (1 << 5)
    meta1 = (
        img_idx.astype(jnp.int32)
        | (src.astype(jnp.int32) << 16)
        | (portrait.astype(jnp.int32) << 21)
        | (wide.astype(jnp.int32) << 22)
        | (tall.astype(jnp.int32) << 23)
    )
    meta2 = y0.astype(jnp.int32) | (x0.astype(jnp.int32) << 16)

    rb = _rois_per_block(out_size, jnp.dtype(feats[0].dtype).itemsize)
    n_rois = b * r
    n_pad = (-n_rois) % rb
    if n_pad:
        pad1 = lambda a: jnp.concatenate(
            [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)]
        )
    else:
        pad1 = lambda a: a

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    extra_inputs = []
    if precomputed_interp:
        wy_all = _interp_matrices(
            o_start_h, o_bin_h, o_h, y0.astype(jnp.float32), WIN_H,
            out_size, sample_num,
        )
        wx_all = _interp_matrices(
            o_start_w, o_bin_w, o_w, x0.astype(jnp.float32), WIN_W,
            out_size, sample_num,
        )
        in_specs += [
            pl.BlockSpec((rb, out_size, WIN_H), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((rb, out_size, WIN_W), lambda i, *_: (i, 0, 0)),
        ]
        extra_inputs = [pad1(wy_all), pad1(wx_all)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=((n_rois + n_pad) // rb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (rb, out_size, out_size, c),
            lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, WIN_H, WIN_W_LO, c), feats[0].dtype),
            pltpu.VMEM((rb, WIN_H, WIN_W - WIN_W_LO, c), feats[0].dtype),
            pltpu.VMEM((out_size, out_size, c), jnp.float32),
            pltpu.SemaphoreType.DMA((rb, 4)),
        ],
    )
    samples = pl.pallas_call(
        functools.partial(
            _kernel, out_size=out_size, sample_num=sample_num, rb=rb,
            row_off=tuple(int(v) for v in row_off),
            sec_h=sec_h, sec_w=sec_w,
            precomputed_interp=precomputed_interp,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_rois + n_pad, out_size, out_size, c), jnp.float32
        ),
        interpret=interpret,
    )(
        pad1(meta1),
        pad1(meta2),
        pad1(o_start_h),
        pad1(o_start_w),
        pad1(o_bin_h),
        pad1(o_bin_w),
        stacked,
        *extra_inputs,
    )[:n_rois]

    # the sample-grid average pooling is folded into the kernel's
    # interpolation matrices — samples ARE the pooled output
    return samples.reshape(b, r, out_size, out_size, c).astype(feats[0].dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def multilevel_roi_align_pallas(
    feats,  # tuple of (B, H_l, W_l, C)
    rois,  # (B, R, 4)
    strides=(4, 8, 16, 32),
    out_size: int = 7,
    sample_num: int = 2,
    finest_scale: int = 56,
    interpret: bool = False,
    bwd_mode: str | None = None,  # None -> module default BWD_MODE
    precomputed_interp: bool | None = None,  # None -> PRECOMPUTED_INTERP
):
    return _forward(
        feats, rois, strides, out_size, sample_num, finest_scale, interpret,
        precomputed_interp,
    )


def _fwd(
    feats, rois, strides, out_size, sample_num, finest_scale, interpret,
    bwd_mode, precomputed_interp,
):
    out = _forward(
        feats, rois, strides, out_size, sample_num, finest_scale, interpret,
        precomputed_interp,
    )
    return out, (feats, rois)


def _interp_matrices(start, bin_sz, size_l, origin, win, out_size, sample_num):
    """Batched (N, out_size, win) separable interpolation weights — the XLA
    twin of the kernel's in-kernel interp_matrix (identical boundary rules:
    roi_align_kernel.cu bilinear_interpolate), vectorized over rois for the
    backward pass."""
    idx = jnp.arange(out_size, dtype=jnp.float32)[None, :, None]  # (1, os, 1)
    cols = jnp.arange(win, dtype=jnp.float32)[None, None, :]  # (1, 1, win)
    start = start[:, None, None]
    bin_sz = bin_sz[:, None, None]
    size_l = size_l[:, None, None]
    origin = origin[:, None, None]
    m_sum = jnp.zeros((start.shape[0], out_size, win), jnp.float32)
    for s in range(sample_num):
        pos = start + bin_sz * (idx + (s + 0.5) / sample_num)
        valid = (pos >= -1.0) & (pos <= size_l)
        p = jnp.maximum(pos, 0.0)
        low = jnp.floor(p)
        collapse = low >= size_l - 1.0
        low = jnp.where(collapse, size_l - 1.0, low)
        p_eff = jnp.where(collapse, low, p)
        high = jnp.where(collapse, low, low + 1.0)
        lfrac = p_eff - low
        hfrac = 1.0 - lfrac
        low_w = jnp.clip(low - origin, 0.0, win - 1.0)
        high_w = jnp.clip(high - origin, 0.0, win - 1.0)
        m = hfrac * (cols == low_w) + lfrac * (cols == high_w)
        m_sum = m_sum + jnp.where(valid, m, 0.0)
    return m_sum / sample_num


def _bwd_dense(strides, out_size, sample_num, finest_scale, res, g,
               variant="dense"):
    """Dense per-level matmul RoIAlign backward — zero scatters, pure MXU.

    The transpose of the separable-interpolation forward, taken in GLOBAL
    level coordinates instead of per-roi windows:

        dL_l[b, y, x, c] = sum_{r in image b, i, j}
            wy[r, i, y] * wx[r, j, x] * g[r, i, j, c]

    where wy/wx are the (os, H_l)/(os, W_l) interpolation matrices from
    _interp_matrices with origin=0 and win=the full level extent — i.e.
    the CUDA backward's exact weights (roi_align_kernel.cu
    ROIAlignBackward), just deposited by matrix multiplication instead of
    atomicAdd. Per level it is two batched dot_generals per image inside
    a lax.scan over images (vmap would materialize the (R*os, W_l*C)
    intermediate for every image at once):

        P[r, i, x, c]  = sum_j wx[r, j, x] g[r, i, j, c]      (tiny: os^2)
        dL_l[y, x, c]  = sum_{(r,i)} wy[r, i, y] P[r, i, x, c]

    Rois routed to other levels contribute exact zeros (their wy rows are
    masked), so every level's einsum runs over the full static roi count —
    wasted MXU lanes instead of dynamic shapes. No orientation/window/
    clamping logic exists on this path at all; summation order differs
    from the scan, so equality is to float tolerance.

    Precision mirrors the forward kernel: f32 pyramids get
    Precision.HIGHEST (no silent one-pass-bf16 lowering of the f32
    matmuls); bf16 pyramids (the production train path) run the MXU at
    full bf16 rate with f32 accumulation — the result is cast to the
    feats dtype either way, exactly like the scan path.
    """
    feats, rois = res
    b, r = rois.shape[:2]
    n = b * r
    c = feats[0].shape[-1]
    num_levels = len(feats)
    fdt = feats[0].dtype
    prec = jax.lax.Precision.HIGHEST if fdt == jnp.float32 else None
    # bf16 pyramids: run the MXU in bf16 (f32 accumulate). The CPU backend
    # has no bf16xbf16=f32 dot — there, round through bf16 (emulating the
    # TPU operand precision) but upcast the dot operands to f32.
    if fdt == jnp.float32:
        mmdt = jnp.float32
        cast = lambda x: x.astype(jnp.float32)
    elif jax.default_backend() == "tpu":
        mmdt = jnp.bfloat16
        cast = lambda x: x.astype(jnp.bfloat16)
    else:
        mmdt = jnp.float32
        cast = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)

    flat_rois = rois.reshape(n, 4).astype(jnp.float32)
    lvls = map_roi_levels(flat_rois, num_levels, finest_scale)
    g = cast(g).reshape(b, r, out_size, out_size, c)

    dfeats = []
    for l, f in enumerate(feats):
        h_l, w_l = int(f.shape[1]), int(f.shape[2])
        scale = 1.0 / float(strides[l])
        start_w = flat_rois[:, 0] * scale
        start_h = flat_rois[:, 1] * scale
        bin_w = jnp.maximum((flat_rois[:, 2] + 1.0) * scale - start_w, 0.0) / out_size
        bin_h = jnp.maximum((flat_rois[:, 3] + 1.0) * scale - start_h, 0.0) / out_size
        zero = jnp.zeros_like(start_h)
        mask = (lvls == l).astype(jnp.float32)[:, None, None]
        wy = _interp_matrices(
            start_h, bin_h, zero + h_l, zero, h_l, out_size, sample_num
        ) * mask  # (N, os, H_l)
        wx = _interp_matrices(
            start_w, bin_w, zero + w_l, zero, w_l, out_size, sample_num
        ) * mask
        wy = cast(wy.reshape(b, r, out_size, h_l))
        wx = cast(wx.reshape(b, r, out_size, w_l))

        # accumulate P in the matmul dtype directly: at bf16 this halves
        # the (R*os, W_l*C) intermediate's HBM traffic and the relayout
        # below, and the os=7-term contraction loses nothing (the MXU
        # accumulates f32 per pass); f32 pyramids keep f32 + HIGHEST.
        # (A "layout-aware" variant that emitted P as (r, i, c, x) so
        # both reshapes are free measured WORSE on the chip — 709 vs 638
        # ms full fwd+bwd — XLA's chosen layouts beat hand-reordering.)
        p_dt = jnp.float32 if fdt == jnp.float32 else mmdt

        def img_body(_, per, h_l=h_l, w_l=w_l):
            wy_b, wx_b, g_b = per  # (r, os, H) (r, os, W) (r, os, os, c)
            if variant == "dense2":
                # rows first: Q[r, y, i->folded, c] then contract (r, j)
                # in ONE dot — no (r*os, W*C) transpose at all, and the
                # intermediate is H_l-sized instead of W_l-sized (1.7x
                # smaller at the 2:1.68 aspect of the padded pyramid);
                # the only relayout left is the (W, H, C) -> (H, W, C)
                # transpose of the final level grad (17 MB at level 0)
                q = jax.lax.dot_general(
                    wy_b, g_b,
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=p_dt,
                    precision=prec,
                )  # (r, y, j, c)
                d = jax.lax.dot_general(
                    wx_b, q,
                    (((0, 1), (0, 2)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )  # (x, y, c)
                return None, jnp.transpose(d, (1, 0, 2))
            # P[r, x, i, c] = sum_j wx_b[r, j, x] g_b[r, i, j, c]
            p = jax.lax.dot_general(
                wx_b, g_b,
                (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=p_dt,
                precision=prec,
            )  # (r, x, i, c)
            # dL[y, (x c)] = sum_{(r i)} wy[(r i), y] P[(r i), (x c)]
            d = jax.lax.dot_general(
                wy_b.reshape(r * out_size, h_l),
                jnp.transpose(p, (0, 2, 1, 3)).reshape(
                    r * out_size, w_l * c
                ),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            return None, d.reshape(h_l, w_l, c)

        _, dl = jax.lax.scan(img_body, None, (wy, wx, g))
        dfeats.append(dl.astype(fdt))
    return tuple(dfeats), None


def _bwd(
    strides, out_size, sample_num, finest_scale, interpret, bwd_mode,
    precomputed_interp, res, g,
):
    mode = bwd_mode if bwd_mode is not None else BWD_MODE
    if mode in ("dense", "dense2"):
        return _bwd_dense(
            strides, out_size, sample_num, finest_scale, res, g, mode
        )
    return _bwd_windowed(
        strides, out_size, sample_num, finest_scale, mode, res, g
    )


def _bwd_windowed(strides, out_size, sample_num, finest_scale, mode, res, g):
    """Scatter-free RoIAlign backward: windowed read-modify-write scan.

    The gather forward's autodiff transpose is an XLA scatter-add with
    ~R*out^2*sample^2 colliding dynamic updates, which TPU serializes
    (measured 5.5 s for 4096 rois — 200x the forward). Instead, the
    transpose of the kernel's two separable matmuls gives each roi a DENSE
    (WIN_H, WIN_W, C) window gradient:

        dwin[h, w, c] = sum_ij wy[i, h] wx[j, w] g_oriented[j, i, c]

    accumulated into a per-level-stacked HBM buffer by one
    dynamic_slice + add + dynamic_update_slice per roi inside lax.scan —
    sequential, so no collisions exist, XLA aliases the carry in place,
    and the cost is window DMA traffic (~2 x 2.6 MB/roi) instead of 800k
    serialized scatter rows. Portrait rois write their window transposed
    into the UNTRANSPOSED level grid (no transposed buffer copy needed —
    that trick only helps the forward's DMA locality).

    Matches the CUDA backward's atomicAdd semantics (roi_align_kernel.cu
    ROIAlignBackward) exactly: same interp weights, same boundary rules.
    """
    feats, rois = res
    b, r = rois.shape[:2]
    c = feats[0].shape[-1]
    num_levels = len(feats)
    g = g.astype(jnp.float32).reshape(b * r, out_size, out_size, c)

    # --- per-roi geometry (mirror of _forward's host-side block) ---
    flat_rois = rois.reshape(b * r, 4).astype(jnp.float32)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    lvls = map_roi_levels(flat_rois, num_levels, finest_scale)
    stride_arr = jnp.asarray(np.asarray(strides, np.float32))
    scale = 1.0 / stride_arr[lvls]
    hs = np.asarray([f.shape[1] for f in feats], np.int32)
    ws = np.asarray([f.shape[2] for f in feats], np.int32)
    h_l = jnp.asarray(hs)[lvls].astype(jnp.float32)
    w_l = jnp.asarray(ws)[lvls].astype(jnp.float32)

    start_w = flat_rois[:, 0] * scale
    start_h = flat_rois[:, 1] * scale
    end_w = (flat_rois[:, 2] + 1.0) * scale
    end_h = (flat_rois[:, 3] + 1.0) * scale
    bin_w = jnp.maximum(end_w - start_w, 0.0) / out_size
    bin_h = jnp.maximum(end_h - start_h, 0.0) / out_size

    portrait = (end_h - start_h) > (end_w - start_w)
    o_start_h = jnp.where(portrait, start_w, start_h)
    o_start_w = jnp.where(portrait, start_h, start_w)
    o_bin_h = jnp.where(portrait, bin_w, bin_h)
    o_bin_w = jnp.where(portrait, bin_h, bin_w)
    o_h = jnp.where(portrait, w_l, h_l)
    o_w = jnp.where(portrait, h_l, w_l)

    y0 = jnp.clip(
        jnp.floor(o_start_h).astype(jnp.int32),
        0,
        jnp.maximum(o_h.astype(jnp.int32) - WIN_H, 0),
    )
    x0 = jnp.clip(
        jnp.floor(o_start_w).astype(jnp.int32),
        0,
        jnp.maximum(o_w.astype(jnp.int32) - WIN_W, 0),
    )
    x0 = (x0 // 8) * 8

    wy = _interp_matrices(
        o_start_h, o_bin_h, o_h, y0.astype(jnp.float32), WIN_H,
        out_size, sample_num,
    )  # (N, os, WIN_H)
    wx = _interp_matrices(
        o_start_w, o_bin_w, o_w, x0.astype(jnp.float32), WIN_W,
        out_size, sample_num,
    )  # (N, os, WIN_W)

    # Accumulation buffer: levels stacked on rows. Each step does ONE
    # unconditional dynamic_slice + add + dynamic_update_slice of a static
    # (WIN_W, WIN_W) canvas — a lax.cond around the update (or per-branch
    # DUS shapes) defeats XLA's in-place aliasing of the scan carry and
    # copies the whole multi-hundred-MB buffer every step (measured 677
    # us/step vs ~20 us in place). The canvas is the (WIN_H, WIN_W) window
    # gradient zero-padded to square and transposed for portrait rois;
    # its zero region may spill past the roi's level section into the
    # trailing padding or the next section — adding zeros is a no-op, the
    # buffer just carries WIN_W-WIN_H extra guard rows/cols at the end so
    # the DUS never clamps (a clamped start would SHIFT the real window).
    guard = WIN_W - WIN_H
    hp = [max(int(h), WIN_W) for h in hs]
    wp = max(max(int(w) for w in ws), WIN_W)
    row_off = np.cumsum([0] + hp[:-1]).astype(np.int32)
    buf = jnp.zeros((b, int(np.sum(hp)) + guard, wp + guard, c), jnp.float32)
    off_r = jnp.asarray(row_off)[lvls]  # stacked row offset of the roi's level
    # level-grid origin of the canvas: portrait windows occupy rows
    # [x0, x0+WIN_W) and cols [y0, y0+WIN_H) of the UNTRANSPOSED grid
    rows0 = off_r + jnp.where(portrait, x0, y0)
    cols0 = jnp.where(portrait, y0, x0)

    if mode == "scatter":
        n = b * r
        chunk = BWD_SCATTER_CHUNK
        # pad the roi axis up to a chunk multiple (zero-gradient rois are
        # no-ops under scatter_add) instead of shrinking the chunk — an odd
        # roi count used to degrade to chunk=1, a per-roi scatter scan that
        # defeats the batching this path exists to measure
        n_pad = (-n) % chunk
        if n_pad:
            padv = lambda a: jnp.concatenate(
                [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)]
            )
            g, wy, wx = padv(g), padv(wy), padv(wx)
            img_idx, rows0 = padv(img_idx), padv(rows0)
            cols0, portrait = padv(cols0), padv(portrait)
            n += n_pad
        hw = WIN_W_LO
        dims = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1, 2),
        )

        def chunk_body(buf, per):
            g_c, wy_c, wx_c, img, r0, c0, por = per
            g_or = jnp.where(
                por[:, None, None, None], g_c, jnp.transpose(g_c, (0, 2, 1, 3))
            )
            dtmp = jnp.einsum("njw,njic->nwic", wx_c, g_or)
            dwin = jnp.einsum("nih,nwic->nhwc", wy_c, dtmp)

            def half(dwin_half, dr, dc):
                canvas = jnp.zeros((dwin_half.shape[0], hw, hw, c), jnp.float32)
                canvas = jax.lax.dynamic_update_slice(
                    canvas, dwin_half, (0, 0, 0, 0)
                )
                canvas = jnp.where(
                    por[:, None, None, None],
                    jnp.transpose(canvas, (0, 2, 1, 3)),
                    canvas,
                )
                return canvas, jnp.stack([img, r0 + dr, c0 + dc], axis=-1)

            zero = jnp.zeros_like(r0)
            off = jnp.full_like(r0, hw)
            cv1, i1 = half(dwin[:, :, :hw], zero, zero)
            cv2, i2 = half(
                dwin[:, :, hw:],
                jnp.where(por, off, zero),
                jnp.where(por, zero, off),
            )
            return (
                jax.lax.scatter_add(
                    buf,
                    jnp.concatenate([i1, i2], axis=0),
                    jnp.concatenate([cv1, cv2], axis=0),
                    dims,
                ),
                None,
            )

        rc = lambda a: a.reshape((n // chunk, chunk) + a.shape[1:])
        buf, _ = jax.lax.scan(
            chunk_body,
            buf,
            tuple(rc(a) for a in (g, wy, wx, img_idx, rows0, cols0, portrait)),
        )
        buf = jax.lax.optimization_barrier(buf)
        return (
            tuple(
                buf[
                    :, row_off[i] : row_off[i] + int(hs[i]), : int(ws[i]), :
                ].astype(feats[i].dtype)
                for i in range(num_levels)
            ),
            None,
        )

    def body(buf, per_roi):
        g_r, wy_r, wx_r, img, r0, c0, por = per_roi
        # un-orient the output gradient: forward stored landscape
        # transposed, so its cotangent transposes back
        g_or = jnp.where(por, g_r, jnp.transpose(g_r, (1, 0, 2)))  # (j, i, c)
        # dtmp[w, i, c] = sum_j wx[j, w] g_or[j, i, c]
        dtmp = jax.lax.dot_general(
            wx_r, g_or.reshape(out_size, out_size * c),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(WIN_W, out_size, c)
        # dwin[h, w, c] = sum_i wy[i, h] dtmp[w, i, c]
        dwin = jax.lax.dot_general(
            wy_r, jnp.transpose(dtmp, (1, 0, 2)).reshape(out_size, WIN_W * c),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(WIN_H, WIN_W, c)
        # The window gradient accumulates as TWO (WIN_W_LO, WIN_W_LO)
        # half-canvases instead of one (WIN_W, WIN_W) square: the square
        # canvas read+wrote 2x 80x80xC f32 (13 MB/roi at C=256) to carry a
        # 32x80 window in either orientation; each 40x40 half holds the
        # 32x40 (or transposed 40x32) half-window exactly, halving the
        # scan's HBM traffic. Both updates stay unconditional (a lax.cond
        # would defeat the carry's in-place aliasing — see above); the hi
        # half of a narrow roi adds exact zeros (its wx columns are zero).
        hw = WIN_W_LO

        def half_update(buf, dwin_half, dr, dc):
            canvas = jnp.zeros((hw, hw, c), jnp.float32)
            canvas = jax.lax.dynamic_update_slice(canvas, dwin_half, (0, 0, 0))
            canvas = jnp.where(por, jnp.transpose(canvas, (1, 0, 2)), canvas)
            cur = jax.lax.dynamic_slice(
                buf, (img, r0 + dr, c0 + dc, 0), (1, hw, hw, c)
            )
            return jax.lax.dynamic_update_slice(
                buf, cur + canvas[None], (img, r0 + dr, c0 + dc, 0)
            )

        zero = jnp.int32(0)
        off = jnp.int32(hw)
        buf = half_update(buf, dwin[:, :hw], zero, zero)
        # hi half sits at +hw along the ORIENTED width: cols for landscape
        # windows, rows for portrait ones (untransposed grid coords)
        buf = half_update(
            buf, dwin[:, hw:],
            jnp.where(por, off, zero), jnp.where(por, zero, off),
        )
        return buf, None

    buf, _ = jax.lax.scan(
        body, buf, (g, wy, wx, img_idx, rows0, cols0, portrait), unroll=4
    )

    # keep the loop's layout choice independent of the (possibly bf16)
    # output conversion below: without the barrier, XLA propagates a
    # bf16-friendly T(1,128) layout onto the f32 carry, inserting a
    # per-iteration relayout copy of the whole canvas (~5x step cost)
    buf = jax.lax.optimization_barrier(buf)

    dfeats = tuple(
        buf[:, row_off[i] : row_off[i] + int(hs[i]), : int(ws[i]), :].astype(
            feats[i].dtype
        )
        for i in range(num_levels)
    )
    return dfeats, None


multilevel_roi_align_pallas.defvjp(_fwd, _bwd)

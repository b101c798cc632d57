#!/usr/bin/env python
"""RoIAlign backward: sequential scan vs chunked window scatter-add.

Round-4 decomposition showed the TRUE full-train backward is dominated by
the RoIAlign VJP (~433 ms of the 622 ms backward @16x512 rois): the
half-canvas lax.scan runs 8192 sequential steps at ~45 us each — latency
bound, 5-6x over its HBM traffic floor.

Candidate: compute window gradients BATCHED (two big MXU matmuls per
chunk) and accumulate with jax.lax.scatter_add of (40,40,C) half-window
canvases — collisions between overlapping rois are legal scatter
semantics, and the update granularity is a window, not the (2,C) rows of
the round-2 catastrophic scatter.

Run: python work_dirs/roi_bwd_scatter_bench.py [--batch 16] [--rois 512]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.ops.roi_align import map_roi_levels
from balancedgroupsoftmax_tpu.pallas import roi_align as ra


def scatter_bwd(feats, rois, g, strides, out_size, sample_num, finest_scale,
                chunk=256):
    """Chunked scatter-add variant of ra._bwd (same math, batched matmuls)."""
    b, r = rois.shape[:2]
    c = feats[0].shape[-1]
    num_levels = len(feats)
    WIN_H, WIN_W, hw = ra.WIN_H, ra.WIN_W, ra.WIN_W_LO
    g = g.astype(jnp.float32).reshape(b * r, out_size, out_size, c)

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

    y0 = jnp.clip(jnp.floor(o_start_h).astype(jnp.int32), 0,
                  jnp.maximum(o_h.astype(jnp.int32) - WIN_H, 0))
    x0 = jnp.clip(jnp.floor(o_start_w).astype(jnp.int32), 0,
                  jnp.maximum(o_w.astype(jnp.int32) - WIN_W, 0))
    x0 = (x0 // 8) * 8

    wy = ra._interp_matrices(o_start_h, o_bin_h, o_h, y0.astype(jnp.float32),
                             WIN_H, out_size, sample_num)
    wx = ra._interp_matrices(o_start_w, o_bin_w, o_w, x0.astype(jnp.float32),
                             WIN_W, out_size, sample_num)

    guard = WIN_W - WIN_H
    hp = [max(int(h), WIN_W) for h in hs]
    wp = max(max(int(w) for w in ws), WIN_W)
    row_off = np.cumsum([0] + hp[:-1]).astype(np.int32)
    buf = jnp.zeros((b, int(np.sum(hp)) + guard, wp + guard, c), jnp.float32)
    off_r = jnp.asarray(row_off)[lvls]
    rows0 = off_r + jnp.where(portrait, x0, y0)
    cols0 = jnp.where(portrait, y0, x0)

    n = b * r
    assert n % chunk == 0
    dims = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )

    def chunk_body(buf, per):
        g_c, wy_c, wx_c, img, r0, c0, por = per
        # batched: dtmp[n, w, i, c], dwin[n, h, w, c]
        g_or = jnp.where(
            por[:, None, None, None], g_c, jnp.transpose(g_c, (0, 2, 1, 3))
        )
        dtmp = jnp.einsum("njw,njic->nwic", wx_c, g_or)
        dwin = jnp.einsum("nih,nwic->nhwc", wy_c, dtmp)  # (n, WIN_H, WIN_W, c)

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
            idx = jnp.stack([img, r0 + dr, c0 + dc], axis=-1)  # (n, 3)
            return canvas, idx

        zero = jnp.zeros_like(r0)
        off = jnp.full_like(r0, hw)
        cv1, i1 = half(dwin[:, :, :hw], zero, zero)
        cv2, i2 = half(dwin[:, :, hw:], jnp.where(por, off, zero),
                       jnp.where(por, zero, off))
        cv = jnp.concatenate([cv1, cv2], axis=0)
        idx = jnp.concatenate([i1, i2], axis=0)
        buf = jax.lax.scatter_add(
            buf, idx, cv, dims,
            indices_are_sorted=False, unique_indices=False,
        )
        return buf, None

    reshape_c = lambda a: a.reshape((n // chunk, chunk) + a.shape[1:])
    buf, _ = jax.lax.scan(
        chunk_body, buf,
        tuple(reshape_c(a) for a in (g, wy, wx, img_idx, rows0, cols0, portrait)),
    )
    buf = jax.lax.optimization_barrier(buf)
    return tuple(
        buf[:, row_off[i]: row_off[i] + int(hs[i]), : int(ws[i]), :].astype(
            feats[i].dtype
        )
        for i in range(num_levels)
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--rois", type=int, default=512)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--chunks", type=int, nargs="*", default=[128, 256, 512])
    args = p.parse_args()

    from balancedgroupsoftmax_tpu import enable_compilation_cache

    enable_compilation_cache()
    b, r, c = args.batch, args.rois, 256
    rng = np.random.RandomState(0)
    h, w = 800, 1344
    feats = tuple(
        jnp.asarray(rng.randn(b, -(-h // s), -(-w // s), c), jnp.bfloat16)
        for s in (4, 8, 16, 32)
    )
    side = np.exp(rng.uniform(np.log(16), np.log(400), (b, r, 2)))
    x0 = rng.uniform(0, w - side[..., 0])
    y0 = rng.uniform(0, h - side[..., 1])
    rois = jnp.asarray(
        np.stack([x0, y0, x0 + side[..., 0], y0 + side[..., 1]], -1), jnp.float32
    )
    g = jnp.asarray(rng.randn(b, r, 7, 7, c), jnp.float32)

    strides = (4, 8, 16, 32)

    def run(fn, label):
        jf = jax.jit(fn)
        out = jax.device_get(jf(feats, rois, g))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r_ = jf(feats, rois, g)
            jax.device_get(jax.tree.map(lambda a: a.sum(), r_))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label}: {dt*1000:.1f} ms")
        return out

    def scan_bwd(feats, rois, g):
        return ra._bwd(strides, 7, 2, 56, False, (feats, rois), g)[0]

    ref = run(scan_bwd, "scan backward (current)")

    for chunk in args.chunks:
        if (b * r) % chunk:
            continue
        fn = functools.partial(
            scatter_bwd, strides=strides, out_size=7, sample_num=2,
            finest_scale=56, chunk=chunk,
        )
        got = run(lambda f, rr, gg: fn(f, rr, gg), f"scatter backward chunk={chunk}")
        errs = [np.abs(np.asarray(a, np.float32) - np.asarray(bb, np.float32)).max()
                for a, bb in zip(ref, got)]
        print(f"  max abs diff vs scan: {max(errs):.3e}")


if __name__ == "__main__":
    main()

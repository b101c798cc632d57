#!/usr/bin/env python
"""DCN formulation microbench (round 4).

gs_htc_dcn_x101 runs at 5.0 img/s (1587 ms/step @8) vs 14.4 for plain HTC
X101 — the deformable conv adds ~1030 ms, dominated by the bilinear-gather
im2col. This bench isolates one DCN layer at the real c3/c4/c5 shapes of
the X101 backbone @800x1344 and compares formulations:

  current   4 corner gathers, 2D advanced indexing  (ops/deform_conv.py)
  flat      same but flat (y*W+x) indices into a (H*W, C) view
  packed    corners pre-packed into (H*W, 4C) by shifts; ONE gather
  matmul    plain conv lower bound (no deformation) for context

Run: python work_dirs/dcn_formulation_bench.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=4):
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(fn(*args))
    return (time.perf_counter() - t0) / iters


GROUPS = 64  # X101-64x4d DCN: dcn=dict(groups=64)


def make_inputs(h, w, c, key, max_off=2.0, dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (h, w, c), dtype)
    offsets = (
        jax.random.uniform(k2, (h, w, 18), jnp.float32, -max_off, max_off)
    )
    weight = jax.random.normal(k3, (3, 3, c // GROUPS, c), dtype) * 0.02
    return x, offsets, weight


def grouped_matmul(cols, weight, h, w):
    """cols (h*w, 9, C_in) x grouped weight -> (h, w, C_out)."""
    taps, c_g, c_out = weight.shape[0] * weight.shape[1], weight.shape[2], weight.shape[3]
    taps = 9
    g = GROUPS
    og = c_out // g
    hw = h * w
    cg = cols.reshape(hw, taps, g, c_g)
    cg = jnp.transpose(cg, (2, 0, 1, 3)).reshape(g, hw, taps * c_g)
    wg = weight.reshape(taps, c_g, g, og)
    wg = jnp.transpose(wg, (2, 0, 1, 3)).reshape(g, taps * c_g, og)
    out = jax.lax.dot_general(
        cg, wg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return jnp.transpose(out, (1, 0, 2)).reshape(h, w, c_out)


def current(x, offsets, weight):
    from balancedgroupsoftmax_tpu.ops.deform_conv import deform_conv2d

    return deform_conv2d(x, offsets, weight, groups=GROUPS)


def _positions(offsets, h, w):
    taps = 9
    base_y = jnp.arange(h, dtype=jnp.float32) - 1.0
    base_x = jnp.arange(w, dtype=jnp.float32) - 1.0
    tap_y = jnp.repeat(jnp.arange(3, dtype=jnp.float32), 3)
    tap_x = jnp.tile(jnp.arange(3, dtype=jnp.float32), 3)
    off = offsets.reshape(h, w, taps, 2)
    ys = base_y[:, None, None] + tap_y[None, None, :] + off[..., 0]
    xs = base_x[None, :, None] + tap_x[None, None, :] + off[..., 1]
    return ys, xs


def flat_gather(x, offsets, weight):
    h, w, c = x.shape
    ys, xs = _positions(offsets, h, w)
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0).astype(x.dtype)
    lx = (xs - x0).astype(x.dtype)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    flat = x.reshape(h * w, c)
    v00 = (y0 >= 0) & (x0 >= 0)
    v01 = (y0 >= 0) & (x0 + 1 <= w - 1)
    v10 = (y0 + 1 <= h - 1) & (x0 >= 0)
    v11 = (y0 + 1 <= h - 1) & (x0 + 1 <= w - 1)
    g00 = jnp.where(v00[..., None], jnp.take(flat, y0i * w + x0i, axis=0), 0)
    g01 = jnp.where(v01[..., None], jnp.take(flat, y0i * w + x1i, axis=0), 0)
    g10 = jnp.where(v10[..., None], jnp.take(flat, y1i * w + x0i, axis=0), 0)
    g11 = jnp.where(v11[..., None], jnp.take(flat, y1i * w + x1i, axis=0), 0)
    cols = (
        g00 * ((1 - ly) * (1 - lx))[..., None]
        + g01 * ((1 - ly) * lx)[..., None]
        + g10 * (ly * (1 - lx))[..., None]
        + g11 * (ly * lx)[..., None]
    )
    cols = jnp.where(valid[..., None], cols, 0)
    return grouped_matmul(cols.reshape(h * w, 9, c), weight, h, w).astype(x.dtype)


def packed_gather(x, offsets, weight):
    """Pack the 2x2 corner neighborhood into channels; ONE gather."""
    h, w, c = x.shape
    ys, xs = _positions(offsets, h, w)
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0).astype(x.dtype)
    lx = (xs - x0).astype(x.dtype)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    # neighbors via pad+slice (cheap, fused): xp1[y, x] = x[y, x+1] etc.
    xr = jnp.pad(x, ((0, 1), (0, 1), (0, 0)))  # zero pad bottom/right
    p00 = xr[:-1, :-1]
    p01 = xr[:-1, 1:]
    p10 = xr[1:, :-1]
    p11 = xr[1:, 1:]
    packed = jnp.concatenate([p00, p01, p10, p11], axis=-1).reshape(h * w, 4 * c)
    g = jnp.take(packed, y0i * w + x0i, axis=0)  # (h, w, 9, 4c)
    g00, g01, g10, g11 = jnp.split(g, 4, axis=-1)
    # correctness note: with the zero pad, out-of-range +1 neighbors are 0
    # except at the clip boundary; corner-validity masks below reproduce the
    # CUDA zero-pad semantics for fully OOB taps. Wrap-around of x+1 at the
    # row edge is prevented by the pad column (x0i==w-1 reads the pad zeros
    # for the 01/11 corners, matching v01/v11=False there... verified vs
    # `current` in the parity check below).
    v00 = (y0 >= 0) & (x0 >= 0)
    v01 = (y0 >= 0) & (x0 + 1 <= w - 1)
    v10 = (y0 + 1 <= h - 1) & (x0 >= 0)
    v11 = (y0 + 1 <= h - 1) & (x0 + 1 <= w - 1)
    cols = (
        jnp.where(v00[..., None], g00, 0) * ((1 - ly) * (1 - lx))[..., None]
        + jnp.where(v01[..., None], g01, 0) * ((1 - ly) * lx)[..., None]
        + jnp.where(v10[..., None], g10, 0) * (ly * (1 - lx))[..., None]
        + jnp.where(v11[..., None], g11, 0) * (ly * lx)[..., None]
    )
    cols = jnp.where(valid[..., None], cols, 0)
    return grouped_matmul(cols.reshape(h * w, 9, c), weight, h, w).astype(x.dtype)


def plain_conv(x, offsets, weight):
    return jax.lax.conv_general_dilated(
        x[None], weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=GROUPS,
    )[0]


def main():
    # X101 @800x1344: c3 (100,168,512), c4 (50,84,1024), c5 (25,42,2048)
    shapes = [
        ("c3", 100, 168, 512),
        ("c4", 50, 84, 1024),
        ("c5", 25, 42, 2048),
    ]
    fns = {
        "current": current,
        "flat": flat_gather,
        "packed": packed_gather,
        "plain_conv": plain_conv,
    }
    key = jax.random.PRNGKey(0)
    for name, h, w, c in shapes:
        x, offsets, weight = make_inputs(h, w, c, key)
        # parity check vs current (f32 for tighter tolerance)
        xf, wf = x.astype(jnp.float32), weight.astype(jnp.float32)
        ref = np.asarray(current(xf, offsets, wf))
        for fname in ("flat", "packed"):
            got = np.asarray(fns[fname](xf, offsets, wf))
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"{name} {fname}: max rel err vs current = {err:.2e}")
        row = [name]
        for fname, fn in fns.items():
            jfn = jax.jit(fn)
            dt = timed(jfn, x, offsets, weight)
            row.append(f"{fname}={dt*1000:.1f}ms")
        print("  ".join(row))


if __name__ == "__main__":
    main()

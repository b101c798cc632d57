#!/usr/bin/env python
"""Deform-conv forward decomposition on the real chip (round 5).

VERDICT round-4 weak #4: gs_htc_dcn_x101 pays ~1030 ms/step @8 over plain
HTC for the c3-c5 grouped-v1 deform convs (30 layers on X101), and
ops/deform_conv.py had no profile splitting the bilinear-gather cost from
the grouped matmul. This script times ONE DeformConv layer per stage shape
(X101-64x4d, 800x1344 inputs) and brackets:

  full        the layer as the model runs it
  gather      bilinear im2col only (cols materialized, matmul skipped)
  matmul      grouped matmul only (cols precomputed outside the timer)
  plain       nn.Conv with the same shape (the no-DCN floor)

Usage: python work_dirs/dcn_bench.py [--batch 8] [--dtype bfloat16]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, iters, *args):
    # reduce on device: fetching full feature maps through the ~22 MB/s
    # tunnel (137 MB-1.2 GB here) would swamp the kernel time 100-1000x
    raw = fn
    fn = jax.jit(
        lambda *a: sum(
            jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(raw(*a))
        )
    )
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    pending = fn(*args)
    for _ in range(iters - 1):
        nxt = fn(*args)
        jax.device_get(pending)
        pending = nxt
    jax.device_get(pending)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument(
        "--shift-window", type=int, default=0,
        help="also time the gather-free shift-decomposition cols builder "
        "(deform_conv2d shift_window=D) full layer + cols-only",
    )
    p.add_argument(
        "--bwd", action="store_true",
        help="time fwd+bwd (value_and_grad wrt x/offsets/weight) for the "
        "gather path vs the shift-window path — the gather's VJP is an "
        "XLA scatter-add (1387 ms for ONE c4 layer, BENCHMARKS round 5); "
        "the shift path's VJP is a sum of pads",
    )
    args = p.parse_args()

    from balancedgroupsoftmax_tpu import enable_compilation_cache
    from balancedgroupsoftmax_tpu.ops import deform_conv as dc

    enable_compilation_cache()
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    b = args.batch

    # X101-64x4d bottleneck 3x3 widths at 800x1344 (stage s: H/2^{s+1}),
    # groups=64 (gs_htc_dconv_* dcn=dict(groups=64)); width = planes *
    # (4/64) * 64 = 4*planes
    stages = {
        "c3": (100, 168, 512),
        "c4": (50, 84, 1024),
        "c5": (25, 42, 2048),
    }
    groups = 64
    for name, (h, w, c) in stages.items():
        x = jnp.asarray(rng.randn(b, h, w, c), dt)
        offsets = jnp.asarray(rng.randn(b, h, w, 18) * 2.0, jnp.float32)
        weight = jnp.asarray(
            rng.randn(3, 3, c // groups, c) * 0.05, dt
        )

        full = jax.jit(
            lambda x, o, wgt: jax.vmap(
                lambda xi, oi: dc.deform_conv2d(xi, oi, wgt, None, 1, 1, groups)
            )(x, o)
        )

        def gather_only(x, o):
            def one(xi, oi):
                kh = kw = 3
                taps = 9
                base_y = jnp.arange(h, dtype=jnp.float32) - 1
                base_x = jnp.arange(w, dtype=jnp.float32) - 1
                tap_y = jnp.repeat(jnp.arange(3, dtype=jnp.float32), 3)
                tap_x = jnp.tile(jnp.arange(3, dtype=jnp.float32), 3)
                off = oi.reshape(h, w, taps, 2)
                ys = base_y[:, None, None] + tap_y[None, None, :] + off[..., 0]
                xs = base_x[None, :, None] + tap_x[None, None, :] + off[..., 1]
                return dc._bilinear_hw(xi, ys, xs)

            return jax.vmap(one)(x, o)

        gather_j = jax.jit(gather_only)

        cols = gather_j(x, offsets)  # (B, H, W, taps, C)

        def matmul_only(cols, wgt):
            # the shipped block-diagonal dense GEMM (ops/deform_conv.py)
            def one(ci):
                og = c // groups
                cg_w = c // groups
                w3 = wgt.reshape(9, cg_w, c)
                gmask = jnp.repeat(jnp.eye(groups, dtype=wgt.dtype), og, axis=1)
                w_dense = (w3[:, None, :, :] * gmask[None, :, None, :]).reshape(
                    9 * c, c
                )
                out = jnp.dot(
                    ci.reshape(h * w, 9 * c), w_dense,
                    preferred_element_type=jnp.float32,
                )
                return out.reshape(h, w, c)

            return jax.vmap(one)(cols)

        matmul_j = jax.jit(matmul_only)

        plain = jax.jit(
            lambda x, wgt: jax.lax.conv_general_dilated(
                x, wgt, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            )
        )

        t_full = timed(full, args.iters, x, offsets, weight)
        t_gather = timed(gather_j, args.iters, x, offsets)
        t_matmul = timed(matmul_j, args.iters, cols, weight)
        t_plain = timed(plain, args.iters, x, weight)
        print(
            f"{name} ({h}x{w}x{c}, B{b}, {args.dtype}): "
            f"full {t_full*1e3:7.2f} ms | gather {t_gather*1e3:7.2f} | "
            f"matmul {t_matmul*1e3:7.2f} | plain-conv {t_plain*1e3:7.2f}",
            flush=True,
        )
        if args.shift_window > 0:
            sw = args.shift_window
            full_sw = jax.jit(
                lambda x, o, wgt: jax.vmap(
                    lambda xi, oi: dc.deform_conv2d(
                        xi, oi, wgt, None, 1, 1, groups, sw
                    )
                )(x, o)
            )
            cols_sw = jax.jit(
                lambda x, o: jax.vmap(
                    lambda xi, oi: dc._shift_window_cols(
                        xi, oi.reshape(h, w, 9, 2), 3, 3, 1, 1, sw
                    )
                )(x, o)
            )
            t_full_sw = timed(full_sw, args.iters, x, offsets, weight)
            t_cols_sw = timed(cols_sw, args.iters, x, offsets)
            print(
                f"   shift-window D={sw}: full {t_full_sw*1e3:7.2f} ms | "
                f"cols {t_cols_sw*1e3:7.2f}",
                flush=True,
            )
        if args.bwd:
            def make_vg(swin):
                def loss(x, o, wgt):
                    out = jax.vmap(
                        lambda xi, oi: dc.deform_conv2d(
                            xi, oi, wgt, None, 1, 1, groups, swin
                        )
                    )(x, o)
                    return jnp.sum(out.astype(jnp.float32))

                return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

            variants = [("gather", 0)]
            if args.shift_window > 0:
                variants.append((f"shift D={args.shift_window}", args.shift_window))
            for vname, swin in variants:
                try:
                    t_v = timed(
                        make_vg(swin), max(2, args.iters // 2),
                        x, offsets, weight,
                    )
                    print(f"   fwd+bwd {vname}: {t_v*1e3:8.2f} ms", flush=True)
                except Exception as e:  # compile OOMs at large batch: record
                    print(
                        f"   fwd+bwd {vname}: FAILED "
                        f"({type(e).__name__}: {str(e).splitlines()[0][:90]})",
                        flush=True,
                    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""RoIAlign kernel: in-kernel vs precomputed interpolation matrices.

The kernel's bracketed floor is per-roi FIXED latency (matmul issue,
scalar sequencing, DMA sync — BENCHMARKS round-1 negative results). One
untried component of that fixed cost: each roi builds its (os, 32) and
(os, 80) interpolation matrices on the VPU in-kernel (4 iota-compare
passes each). PRECOMPUTED_INTERP builds them batched in XLA and streams
them in as pipelined VMEM inputs (~3 KB/roi HBM).

Run: python work_dirs/roi_interp_bench.py [--batch 16] [--rois 1000]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--rois", type=int, default=1000)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from balancedgroupsoftmax_tpu import enable_compilation_cache
    from balancedgroupsoftmax_tpu.pallas import roi_align as ra

    enable_compilation_cache()
    b, r, c = args.batch, args.rois, 256
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    h, w = 800, 1344
    feats = tuple(
        jnp.asarray(rng.randn(b, -(-h // s), -(-w // s), c), dt)
        for s in (4, 8, 16, 32)
    )
    # LVIS-like small-object-heavy roi mix
    side = np.exp(rng.uniform(np.log(16), np.log(400), (b, r, 2)))
    x0 = rng.uniform(0, w - side[..., 0])
    y0 = rng.uniform(0, h - side[..., 1])
    rois = jnp.asarray(
        np.stack([x0, y0, x0 + side[..., 0], y0 + side[..., 1]], -1), jnp.float32
    )

    outs = {}
    for flag in (False, True):
        # explicit static arg (round-5 API): a changed value is a new jit
        # cache key, so the toggle can never be silently ignored
        fn = jax.jit(
            lambda f, rr, flag=flag: ra.multilevel_roi_align_pallas(
                f, rr, (4, 8, 16, 32), 7, 2, 56, False, None, flag
            )
        )
        # timing fn returns a scalar: fetching the (B*R, 7, 7, C) output
        # through the ~22 MB/s tunnel would swamp the kernel time
        tfn = jax.jit(
            lambda f, rr, flag=flag: jnp.sum(
                ra.multilevel_roi_align_pallas(
                    f, rr, (4, 8, 16, 32), 7, 2, 56, False, None, flag
                ).astype(jnp.float32)
            )
        )
        outs[flag] = jax.device_get(fn(feats, rois))
        jax.device_get(tfn(feats, rois))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            jax.device_get(tfn(feats, rois))
        dt_s = (time.perf_counter() - t0) / args.iters
        print(
            f"precomputed={flag}: {dt_s*1000:.1f} ms "
            f"({dt_s/(b*r)*1e6:.2f} us/roi)"
        )
    same = np.array_equal(outs[False], outs[True])
    print("outputs bit-identical:", same)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Profiling: jax.profiler traces + step timing for train/infer graphs.

Replaces the reference's tracing story (mmcv IterTimerHook + FLOPs hooks,
SURVEY.md §5): captures an XLA/TPU trace viewable in TensorBoard or
Perfetto, and prints steady-state step timings.

Usage:
  python tools/profile.py --mode infer --batch 8 --trace-dir /tmp/bags_trace
  python tools/profile.py --mode train --batch 8
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
    p.add_argument("--mode", choices=["infer", "train"], default="infer")
    p.add_argument("--model", default="gs_faster_rcnn_r50")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace-dir", default=None, help="enable jax.profiler trace")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    from balancedgroupsoftmax_tpu import zoo
    from balancedgroupsoftmax_tpu.gs.partition import synthetic_partition
    from balancedgroupsoftmax_tpu.models.detector import build_detector

    builders = {
        "faster_rcnn_r50": zoo.faster_rcnn_r50_fpn_lvis,
        "gs_faster_rcnn_r50": zoo.gs_faster_rcnn_r50_fpn_lvis,
    }
    det_cfg, train_cfg = builders[args.model]()
    if args.remat:
        import dataclasses
        det_cfg = dataclasses.replace(
            det_cfg,
            backbone=dataclasses.replace(det_cfg.backbone, remat=True),
        )
    partition = (
        synthetic_partition(det_cfg.bbox_head.num_classes)
        if det_cfg.bbox_head.use_gs
        else None
    )
    model = build_detector(det_cfg, partition=partition, dtype=jnp.dtype(args.dtype))
    h, w = det_cfg.image_size
    b = args.batch
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (b, 1))

    if args.mode == "infer":
        fn = jax.jit(
            lambda v, im, sh: model.apply(v, im, sh, jnp.ones(b), method="predict")
        )
        run = lambda: jax.device_get(fn(variables, images, shapes))
    else:
        from balancedgroupsoftmax_tpu.parallel.optim import make_optimizer
        from balancedgroupsoftmax_tpu.parallel.train import (
            create_train_state, make_train_step,
        )

        tx = make_optimizer(train_cfg, variables["params"])
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
        g = det_cfg.max_gt_boxes
        batch = dict(
            images=images,
            gt_boxes=jnp.asarray(rng.uniform(0, 400, (b, g, 4)).astype(np.float32)),
            gt_labels=jnp.asarray(
                rng.randint(1, det_cfg.bbox_head.num_classes, (b, g)), jnp.int32
            ),
            gt_mask=jnp.asarray(np.arange(g)[None, :].repeat(b, 0) < 5),
            img_shapes=shapes,
        )
        batch["gt_boxes"] = batch["gt_boxes"].at[..., 2:].add(
            batch["gt_boxes"][..., :2]
        )
        holder = {"state": state}

        def run():
            holder["state"], metrics = step(
                holder["state"], batch, jax.random.PRNGKey(1)
            )
            return jax.device_get(metrics["loss"])

    t0 = time.perf_counter()
    run()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        run()
    dt = (time.perf_counter() - t0) / args.iters
    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")
    print(
        f"{args.mode} steady: {dt * 1000:.1f} ms/step, "
        f"{b / dt:.2f} images/sec (batch {b})"
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Profiling: jax.profiler traces + step timing for train/infer graphs.

Replaces the reference's tracing story (mmcv IterTimerHook + FLOPs hooks,
SURVEY.md §5): captures an XLA/TPU trace viewable in TensorBoard or
Perfetto, and prints steady-state step timings. Covers every zoo family
(faster/mask/cascade/HTC × plain/GS, incl. the X101-64x4d and DCN
backbones of /root/reference/configs/bags/gs_htc_dconv_*).

Usage:
  python tools/profile.py --mode infer --batch 8 --trace-dir /tmp/bags_trace
  python tools/profile.py --mode train --batch 8
  python tools/profile.py --model gs_htc_dcn_x101 --batch 4 --pipelined
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
    p.add_argument(
        "--model", default="gs_faster_rcnn_r50",
        choices=["faster_rcnn_r50", "gs_faster_rcnn_r50", "faster_rcnn_x101",
                 "mask_rcnn_r50", "gs_mask_rcnn_r50", "cascade_rcnn_r50",
                 "gs_cascade_rcnn_r50", "cascade_rcnn_x101",
                 "gs_cascade_rcnn_x101", "htc_x101", "gs_htc_x101",
                 "gs_htc_dcn_x101"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace-dir", default=None, help="enable jax.profiler trace")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--selectp", type=int, default=None,
                   help="override the config's selectp for --mode train "
                        "(0 = full training; gs configs default to the "
                        "phase-2 recipe selectp>=1, whose frozen backward "
                        "is now elided)")
    p.add_argument("--pipelined", action="store_true",
                   help="depth-2 dispatch/fetch overlap (bench.py "
                        "methodology — hides the ~33ms tunnel RTT)")
    args = p.parse_args()

    from balancedgroupsoftmax_tpu import enable_compilation_cache, zoo
    from balancedgroupsoftmax_tpu.gs.partition import synthetic_partition
    from balancedgroupsoftmax_tpu.models.detector import build_model

    import os as _os
    if _os.environ.get("DCN_DENSE") is not None or _os.environ.get("DCN_F32_COLS"):
        # A/B the deform-conv formulation (trace-time toggles; set before
        # any jit — work_dirs/dcn_bench.py + BENCHMARKS round 5)
        from balancedgroupsoftmax_tpu.ops import deform_conv as _dc

        if _os.environ.get("DCN_DENSE") is not None:
            _dc.DENSE_GROUPS = _os.environ["DCN_DENSE"] == "1"
        if _os.environ.get("DCN_F32_COLS"):
            _dc.F32_COLS = _os.environ["DCN_F32_COLS"] == "1"
        print(f"dcn: DENSE_GROUPS={_dc.DENSE_GROUPS} F32_COLS={_dc.F32_COLS}")

    enable_compilation_cache()

    builders = {
        "faster_rcnn_r50": zoo.faster_rcnn_r50_fpn_lvis,
        "gs_faster_rcnn_r50": zoo.gs_faster_rcnn_r50_fpn_lvis,
        "faster_rcnn_x101": zoo.faster_rcnn_x101_64x4d_fpn_lvis,
        "mask_rcnn_r50": zoo.mask_rcnn_r50_fpn_lvis,
        "gs_mask_rcnn_r50": lambda: zoo.mask_rcnn_r50_fpn_lvis(use_gs=True),
        "cascade_rcnn_r50": zoo.cascade_rcnn_r50_fpn_lvis,
        "gs_cascade_rcnn_r50": lambda: zoo.cascade_rcnn_r50_fpn_lvis(use_gs=True),
        "cascade_rcnn_x101": zoo.cascade_rcnn_x101_64x4d_fpn_lvis,
        "gs_cascade_rcnn_x101": lambda: zoo.cascade_rcnn_x101_64x4d_fpn_lvis(use_gs=True),
        "htc_x101": zoo.htc_x101_64x4d_fpn_lvis,
        "gs_htc_x101": lambda: zoo.htc_x101_64x4d_fpn_lvis(use_gs=True),
        "gs_htc_dcn_x101": lambda: zoo.htc_x101_64x4d_fpn_lvis(
            use_gs=True, dcn=True,
            dcn_shift_window=int(_os.environ.get("DCN_SHIFT_WINDOW", "0")),
        ),
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
    model = build_model(det_cfg, partition=partition, dtype=jnp.dtype(args.dtype))
    h, w = det_cfg.image_size
    b = args.batch
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (b, 1))

    if args.mode == "infer":
        # Mask-bearing families serve the fused single-pass graph (one
        # backbone/semantic evaluation for both branches, the reference's
        # simple_test structure, two_stage.py:267-290 / htc.py:157-199).
        method = "predict_with_masks" if det_cfg.mask_head is not None else "predict"
        fn = jax.jit(
            lambda v, im, sh: model.apply(
                v, im, sh, jnp.ones(b), method=method
            )
        )
        dispatch = lambda: fn(variables, images, shapes)
        run = lambda: jax.device_get(dispatch())
    else:
        from balancedgroupsoftmax_tpu.parallel.optim import (
            make_optimizer, trainable_mask,
        )
        from balancedgroupsoftmax_tpu.parallel.train import (
            create_train_state, make_train_step,
        )

        import dataclasses as _dc
        if args.selectp is not None:
            train_cfg = _dc.replace(train_cfg, selectp=args.selectp)
        tx = make_optimizer(
            train_cfg, variables["params"],
            frozen_stages=det_cfg.backbone.frozen_stages,
        )
        mask = trainable_mask(
            variables["params"], train_cfg.selectp,
            det_cfg.backbone.frozen_stages,
        )
        state = create_train_state(variables, tx)
        step = jax.jit(
            make_train_step(model, tx, trainable=mask), donate_argnums=(0,)
        )
        g = det_cfg.max_gt_boxes
        # LVIS-like log-uniform gt sizes (16-300px) — the proposal/roi mix
        # entering the RoIAlign fwd+bwd follows these targets
        side = np.exp(rng.uniform(np.log(16), np.log(300), (b, g, 2)))
        x0 = rng.uniform(0, w - side[..., 0])
        y0 = rng.uniform(0, h - side[..., 1])
        boxes = np.stack(
            [x0, y0, x0 + side[..., 0], y0 + side[..., 1]], axis=-1
        ).astype(np.float32)
        batch = dict(
            images=images,
            gt_boxes=jnp.asarray(boxes),
            gt_labels=jnp.asarray(
                rng.randint(1, det_cfg.bbox_head.num_classes, (b, g)), jnp.int32
            ),
            gt_mask=jnp.asarray(np.arange(g)[None, :].repeat(b, 0) < 12),
            img_shapes=shapes,
        )
        if det_cfg.mask_head is not None:
            from balancedgroupsoftmax_tpu.ops.mask import GT_MASK_CROP

            crops = (rng.rand(b, g, GT_MASK_CROP, GT_MASK_CROP) > 0.5).astype(
                np.float32
            )
            batch["gt_mask_crops"] = jnp.asarray(crops)
        holder = {"state": state}

        def dispatch():
            holder["state"], metrics = step(
                holder["state"], batch, jax.random.PRNGKey(1)
            )
            return metrics["loss"]

        run = lambda: jax.device_get(dispatch())

    t0 = time.perf_counter()
    run()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    if args.pipelined:
        pending = dispatch()
        for _ in range(args.iters - 1):
            nxt = dispatch()
            jax.device_get(pending)
            pending = nxt
        jax.device_get(pending)
    else:
        for _ in range(args.iters):
            run()
    dt = (time.perf_counter() - t0) / args.iters
    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")
    print(
        f"{args.model} {args.mode} steady: {dt * 1000:.1f} ms/step, "
        f"{b / dt:.2f} images/sec (batch {b}"
        f"{', pipelined' if args.pipelined else ''})"
    )


if __name__ == "__main__":
    main()

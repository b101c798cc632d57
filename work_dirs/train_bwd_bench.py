#!/usr/bin/env python
"""Train-step MFU + backward decomposition on the real chip (round 4).

Answers VERDICT round-3 weak #3: BENCHMARKS gives 222.5 ms @16 for the
full train step and says it "is dominated by the conv backward", but the
backward had never been decomposed the way the forward was.

Method: jax.value_and_grad w.r.t. SUBTREES of the param pytree (frozen
subtrees passed through a closure) — XLA dead-code-eliminates the backward
chains that no requested gradient needs, so timing differences attribute
backward stages without touching product code:

  full           grad wrt all params                (whole backward)
  no_backbone    grad wrt neck+rpn+heads            (drops backbone conv bwd)
  heads_only     grad wrt bbox(+mask) head only     (drops roi-align VJP,
                                                     FPN bwd, RPN bwd too)
  fwd_only       loss value only                    (no backward)

MFU: compiled cost analysis FLOPs / measured step time vs the v5e bf16
peak (197 TFLOP/s).

Usage: python work_dirs/train_bwd_bench.py [--batch 16] [--model gs_faster_rcnn_r50]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12


def timed(fn, iters, *args):
    jax.device_get(fn(*args))  # compile + warm
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
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--model", default="gs_faster_rcnn_r50")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import os

    from balancedgroupsoftmax_tpu import enable_compilation_cache, zoo

    if os.environ.get("BWD_MODE"):
        from balancedgroupsoftmax_tpu.pallas import roi_align as _ra

        # set BEFORE any trace: model call sites use the module default
        _ra.BWD_MODE = os.environ["BWD_MODE"]
        print(f"roi-align backward: {_ra.BWD_MODE} variant")
    from balancedgroupsoftmax_tpu.gs.partition import synthetic_partition
    from balancedgroupsoftmax_tpu.models.detector import build_model

    enable_compilation_cache()

    builders = {
        "gs_faster_rcnn_r50": zoo.gs_faster_rcnn_r50_fpn_lvis,
        "gs_mask_rcnn_r50": lambda: zoo.mask_rcnn_r50_fpn_lvis(use_gs=True),
    }
    det_cfg, train_cfg = builders[args.model]()
    partition = synthetic_partition(det_cfg.bbox_head.num_classes)
    model = build_model(det_cfg, partition=partition, dtype=jnp.dtype(args.dtype))
    h, w = det_cfg.image_size
    b = args.batch
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    print("param top-level keys:", list(params.keys()))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (b, 1))
    g = det_cfg.max_gt_boxes
    side = np.exp(rng.uniform(np.log(16), np.log(300), (b, g, 2)))
    x0 = rng.uniform(0, w - side[..., 0])
    y0 = rng.uniform(0, h - side[..., 1])
    boxes = np.stack([x0, y0, x0 + side[..., 0], y0 + side[..., 1]], -1).astype(
        np.float32
    )
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

        batch["gt_mask_crops"] = jnp.asarray(
            (rng.rand(b, g, GT_MASK_CROP, GT_MASK_CROP) > 0.5).astype(np.float32)
        )
    key = jax.random.PRNGKey(1)

    def loss_from(full_params):
        losses = model.apply(
            {"params": full_params, "batch_stats": batch_stats},
            batch["images"],
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_mask"],
            batch["img_shapes"],
            batch.get("gt_mask_crops"),
            method="loss",
            rngs={"sampling": key},
        )
        return sum(v for k, v in losses.items() if k.startswith("loss"))

    def split(train_keys):
        train = {k: v for k, v in params.items() if k in train_keys}
        frozen = {k: v for k, v in params.items() if k not in train_keys}
        return train, frozen

    head_keys = [k for k in params.keys() if "head" in k and k != "rpn_head"]
    variants = {
        "full": list(params.keys()),
        "no_backbone": [k for k in params.keys() if k != "backbone"],
        "necks_heads": [k for k in params.keys() if k not in ("backbone",)
                        and k != "rpn_head"],  # drops RPN branch bwd too
        "heads_only": head_keys,
    }
    import os
    if os.environ.get("BWD_VARIANTS"):
        keep = os.environ["BWD_VARIANTS"].split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {}

    # the real train step (donated state, optimizer included) — the MFU
    # denominator and the number BENCHMARKS quotes
    from balancedgroupsoftmax_tpu.parallel.optim import make_optimizer
    from balancedgroupsoftmax_tpu.parallel.train import (
        create_train_state, make_train_step,
    )

    tx = make_optimizer(train_cfg, params)
    # the step donates its state — hand it a COPY so `params` stays alive
    # for the gradient-subtree variants below
    state = create_train_state(jax.tree.map(jnp.copy, variables), tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    holder = {"state": state}

    def step_fn(_):
        holder["state"], metrics = step(holder["state"], batch, key)
        return metrics["loss"]

    results["train_step"] = timed(step_fn, args.iters, None)
    step_flops = (
        step.lower(holder["state"], batch, key).compile().cost_analysis()
    ).get("flops", float("nan"))

    # forward only
    fwd = jax.jit(loss_from)
    results["fwd_only"] = timed(fwd, args.iters, params)
    fwd_cost = fwd.lower(params).compile().cost_analysis()
    fwd_flops = fwd_cost.get("flops", float("nan"))

    full_flops = None
    for name, keys in variants.items():
        train, frozen = split(keys)

        def vg(train_p, frozen_p):
            def f(tp):
                merged = dict(frozen_p)
                merged.update(tp)
                return loss_from(merged)

            loss, grads = jax.value_and_grad(f)(train_p)
            # reduce grads on-device: fetching the full cotangent tree
            # through the ~22 MB/s tunnel would swamp the measurement
            gn = sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)
            )
            return loss, gn

        fn = jax.jit(vg)
        results[name] = timed(fn, args.iters, train, frozen)
        if name == "full":
            ca = fn.lower(train, frozen).compile().cost_analysis()
            full_flops = ca.get("flops", float("nan"))

    print(f"\n== {args.model} @ batch {b}, {args.dtype}, {h}x{w} ==")
    for name, dt in results.items():
        print(f"{name:>14}: {dt*1000:8.1f} ms")
    r = results

    def diff(label, a, b):
        if a in r and b in r:
            print(f"{label}: {(r[a] - r[b])*1000:8.1f} ms")

    diff("backward total     ", "full", "fwd_only")
    diff("backbone bwd       ", "full", "no_backbone")
    diff("rpn-branch bwd     ", "no_backbone", "necks_heads")
    diff("roi VJP + neck bwd ", "necks_heads", "heads_only")
    diff("head bwd           ", "heads_only", "fwd_only")
    t_full = results.get("full", float("nan"))
    print(f"\nforward  FLOPs: {fwd_flops/1e12:.2f} TFLOP  "
          f"-> {fwd_flops/results['fwd_only']/V5E_BF16_PEAK*100:.1f}% MFU")
    if full_flops == full_flops:
        print(f"fwd+bwd  FLOPs: {full_flops/1e12:.2f} TFLOP  "
              f"-> {full_flops/t_full/V5E_BF16_PEAK*100:.1f}% MFU "
              f"(vs v5e bf16 peak {V5E_BF16_PEAK/1e12:.0f} TFLOP/s)")
    if step_flops == step_flops and "train_step" in results:
        print(f"train step FLOPs: {step_flops/1e12:.2f} TFLOP  "
              f"-> {step_flops/results['train_step']/V5E_BF16_PEAK*100:.1f}% MFU")


if __name__ == "__main__":
    main()

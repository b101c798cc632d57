#!/usr/bin/env python
"""FLOPs / parameter counting via XLA cost analysis.

Parity: /root/reference/tools/get_flops.py + mmdet/utils/flops_counter.py
(473 LoC of module hooks) — replaced by the compiler's own cost model:
jit(forward).lower().compile().cost_analysis() on the dummy forward
(two_stage.py forward_dummy equivalent).

Usage: python tools/get_flops.py --model gs_faster_rcnn_r50 --shape 800 1344
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="gs_faster_rcnn_r50",
                   choices=["faster_rcnn_r50", "gs_faster_rcnn_r50", "faster_rcnn_x101"])
    p.add_argument("--shape", type=int, nargs=2, default=[800, 1344])
    args = p.parse_args()

    from balancedgroupsoftmax_tpu import zoo
    from balancedgroupsoftmax_tpu.gs.partition import synthetic_partition
    from balancedgroupsoftmax_tpu.models.detector import build_detector

    builders = {
        "faster_rcnn_r50": zoo.faster_rcnn_r50_fpn_lvis,
        "gs_faster_rcnn_r50": zoo.gs_faster_rcnn_r50_fpn_lvis,
        "faster_rcnn_x101": zoo.faster_rcnn_x101_64x4d_fpn_lvis,
    }
    import dataclasses

    det_cfg, _ = builders[args.model]()
    det_cfg = dataclasses.replace(det_cfg, image_size=tuple(args.shape))
    partition = (
        synthetic_partition(det_cfg.bbox_head.num_classes)
        if det_cfg.bbox_head.use_gs
        else None
    )
    model = build_detector(det_cfg, partition=partition)

    h, w = det_cfg.image_size
    images = jnp.zeros((1, h, w, 3))
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), images)
    n_params = sum(
        int(jnp.prod(jnp.asarray(x.shape)))
        for x in jax.tree_util.tree_leaves(variables["params"])
    )

    def fwd(v, x):
        return model.apply(v, x)  # forward_dummy equivalent

    lowered = jax.jit(fwd).lower(variables, images)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    print(f"model: {args.model} @ {h}x{w}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops (XLA cost analysis): {flops / 1e9:.2f} GFLOPs")
    for k in sorted(cost):
        if "bytes" in k and isinstance(cost[k], (int, float)) and cost[k] > 0:
            print(f"  {k}: {cost[k] / 1e6:.1f} MB")


if __name__ == "__main__":
    main()

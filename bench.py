"""Benchmark: BAGS Faster R-CNN R50-FPN inference throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measures the full flagship inference graph — backbone + FPN + RPN +
proposal NMS + fused multi-level RoIAlign + grouped-softmax head + score
merge + 1231-class NMS — at batch 16, bf16, 800x1344, with detections
fetched to host each step (as a serving pipeline would).

Baseline context (BASELINE.md): the reference publishes no speed numbers;
the north star is >= 2x an A100 running the mmdetection stack. We use an
estimated 25 images/sec/chip for A100 fp16 Faster R-CNN R50-FPN @ 800x1333
single-image inference (mmdetection model-zoo-era measurements) as the
denominator, so vs_baseline = ours / 25.0.

Note: jax.block_until_ready does not synchronize on the axon tunnel
platform; jax.device_get of the outputs is the only reliable fence, and is
what a consumer of the detections needs anyway.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_IMG_PER_SEC = 25.0
# batch 32 is the measured-best serving point (124.1 vs 118.0 img/s at
# batch 16 — BENCHMARKS.md round 3); the SMEM-packed RoIAlign prefetch
# (13 -> 6 vectors) is what lets 32x1000 rois fit the 1MB scalar budget
BATCH = 32
WARMUP = 2
ITERS = 10


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from balancedgroupsoftmax_tpu.gs.partition import synthetic_partition
    from balancedgroupsoftmax_tpu.models.detector import build_detector
    from balancedgroupsoftmax_tpu.zoo import gs_faster_rcnn_r50_fpn_lvis

    det_cfg, _ = gs_faster_rcnn_r50_fpn_lvis()
    partition = synthetic_partition(det_cfg.bbox_head.num_classes)
    model = build_detector(det_cfg, partition=partition, dtype=jnp.bfloat16)

    h, w = det_cfg.image_size
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))

    @jax.jit
    def forward(variables, images, img_shapes, scale_factors):
        return model.apply(
            variables, images, img_shapes, scale_factors, method="predict"
        )

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(BATCH, h, w, 3), jnp.float32)
    img_shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (BATCH, 1))
    scale_factors = jnp.ones((BATCH,), jnp.float32)

    for _ in range(WARMUP):
        dets = forward(variables, images, img_shapes, scale_factors)
        jax.device_get(dets)

    def measure(iters):
        # depth-2 pipeline: dispatch step i+1 before fetching step i, as a
        # serving loop would — overlaps the host<->device transfer latency
        # (which on the axon tunnel is a fixed ~33ms per round trip) with
        # the next step's device compute. Every step's detections are
        # still fetched to host.
        t0 = time.perf_counter()
        pending = forward(variables, images, img_shapes, scale_factors)
        for _ in range(iters - 1):
            nxt = forward(variables, images, img_shapes, scale_factors)
            jax.device_get(pending)
            pending = nxt
        jax.device_get(pending)
        return BATCH * iters / (time.perf_counter() - t0)

    def emit(imgs_per_sec, tag=""):
        print(
            json.dumps(
                {
                    "metric": f"images/sec/chip (BAGS Faster R-CNN R50-FPN, 1231-class GS head, 800x1344, bf16, batch {BATCH}, single-chip inference incl. detection fetch{tag})",
                    "value": round(imgs_per_sec, 3),
                    "unit": "images/sec/chip",
                    "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
                }
            ),
            flush=True,
        )

    # coarse early reading FIRST: a driver timeout mid-way through the
    # full measurement still leaves one parsable JSON line (round-4
    # BENCH_r04.json was empty after an rc-124 cold-compile timeout). The
    # refined 10-iteration line prints last and supersedes it.
    emit(measure(3), tag="; coarse 3-iter reading")
    emit(measure(ITERS))


if __name__ == "__main__":
    main()

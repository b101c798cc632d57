"""Ad-hoc: decompose gs_mask_rcnn_r50 predict_with_masks stage costs on TPU.

Times (batch 16, bf16, 800x1344):
  1. predict (detection-only graph)
  2. predict_with_masks (fused)
  3. mask-branch pieces in isolation: 14x14 RoIAlign over 300 dets,
     mask head conv stack, class-selected 1x1.
"""

import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from balancedgroupsoftmax_tpu import zoo
from balancedgroupsoftmax_tpu.gs.partition import synthetic_partition
from balancedgroupsoftmax_tpu.models.detector import build_model
from balancedgroupsoftmax_tpu.kernels import batched_multilevel_roi_align

det_cfg, _ = zoo.mask_rcnn_r50_fpn_lvis(use_gs=True)
partition = synthetic_partition(det_cfg.bbox_head.num_classes)
model = build_model(det_cfg, partition=partition, dtype=jnp.bfloat16)
h, w = det_cfg.image_size
B = 16
variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))

rng = np.random.RandomState(0)
images = jnp.asarray(rng.randn(B, h, w, 3), jnp.float32)
shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (B, 1))
sfs = jnp.ones((B,), jnp.float32)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.1f} ms")
    return out


f_pred = jax.jit(lambda v, im, sh, sf: model.apply(v, im, sh, sf, method="predict"))
f_full = jax.jit(
    lambda v, im, sh, sf: model.apply(v, im, sh, sf, method="predict_with_masks")
)
dets = timeit("predict (det only)", f_pred, variables, images, shapes, sfs)
timeit("predict_with_masks", f_full, variables, images, shapes, sfs)

# mask branch pieces
f_feats = jax.jit(lambda v, im: model.apply(v, im, method="extract_feats"))
feats = timeit("extract_feats", f_feats, variables, images)

M = dets.boxes.shape[1]
print("num dets slots:", M)
det_boxes = jnp.asarray(dets.boxes)
det_labels = jnp.asarray(dets.labels)

c = det_cfg
f_pool = jax.jit(
    lambda fs, bx: batched_multilevel_roi_align(
        fs[: len(c.roi_extractor.featmap_strides)],
        bx,
        c.roi_extractor.featmap_strides,
        c.mask_head.mask_size // 2,
        c.roi_extractor.sample_num,
        c.roi_extractor.finest_scale,
    )
)
pooled = timeit("mask RoIAlign 14x14 x300", f_pool, feats, det_boxes)

f_mh = jax.jit(
    lambda v, p, lb: model.apply(
        v, p, labels=lb, method=lambda m, p, labels: m.mask_head(p, labels=labels)
    )
)
timeit("mask head (4conv+deconv+sel1x1)", f_mh, variables, pooled, det_labels)

f_masks = jax.jit(
    lambda v, fs, bx, lb, sf: model.apply(
        v, fs, bx, lb, sf,
        method=lambda m, fs, bx, lb, sf: m._masks_feats(fs, bx, lb, sf),
    )
)
timeit("_masks_feats (pool+head+sigmoid)", f_masks, variables, feats, det_boxes, det_labels, sfs)

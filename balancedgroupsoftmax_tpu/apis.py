"""High-level user API: build/load a detector and run single-image inference.

Parity: /root/reference/mmdet/apis/inference.py (`init_detector`,
`inference_detector`, `show_result`) and apis/env.py's seeding
(`set_random_seed`). The distributed init (`init_dist`) has no equivalent —
jax.distributed.initialize + the mesh in parallel/train.py replace the NCCL
process-group machinery.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def set_random_seed(seed: int) -> jax.Array:
    """Deterministic seeding (apis/env.py:72-79 parity): returns the root
    PRNG key; numpy's global state is also seeded for host-side pipelines."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class Detector:
    """A loaded model + jitted predict functions for both aspect buckets."""

    def __init__(self, model, variables, det_cfg, cat_ids=None):
        import dataclasses

        from .data.pipeline import LANDSCAPE_BUCKET, PORTRAIT_BUCKET

        self.det_cfg = det_cfg
        self.variables = variables
        self.cat_ids = cat_ids or list(range(1, det_cfg.bbox_head.num_classes))
        self._fns = {}
        for bucket in (LANDSCAPE_BUCKET, PORTRAIT_BUCKET):
            cfg_b = dataclasses.replace(det_cfg, image_size=bucket)
            m = type(model)(
                cfg=cfg_b,
                partition=getattr(model, "partition", None),
                dtype=model.dtype,
            )
            self._fns[bucket] = jax.jit(
                lambda v, im, sh, sf, m=m: m.apply(v, im, sh, sf, method="predict")
            )

    def __call__(self, image: np.ndarray):
        """image: (H, W, 3) uint8 RGB -> list of detection dicts."""
        from .data.pipeline import PipelineConfig, preprocess_image

        s = preprocess_image(
            image, np.zeros((0, 4), np.float32), np.zeros(0, np.int32),
            PipelineConfig(), train=False,
        )
        dets = self._fns[s["bucket"]](
            self.variables,
            jnp.asarray(s["image"][None]),
            jnp.asarray(s["img_shape"][None]),
            jnp.asarray([s["scale_factor"]]),
        )
        boxes = np.asarray(dets.boxes[0])
        scores = np.asarray(dets.scores[0])
        labels = np.asarray(dets.labels[0])
        valid = np.asarray(dets.valid[0])
        return [
            dict(
                bbox=boxes[i].tolist(),
                score=float(scores[i]),
                label=int(labels[i]),
                category_id=int(self.cat_ids[int(labels[i])]),
            )
            for i in range(len(boxes))
            if valid[i]
        ]


def init_detector(
    model_name: str = "gs_faster_rcnn_r50",
    checkpoint: Optional[str] = None,
    partition_path: Optional[str] = None,
    dtype=jnp.float32,
) -> Detector:
    """Build (and optionally load) a detector (apis/inference.py:16 parity)."""
    from . import zoo
    from .gs.partition import load_partition, synthetic_partition
    from .models.detector import build_model as build_detector
    from .utils.checkpoint import restore_checkpoint

    builders = {
        "faster_rcnn_r50": zoo.faster_rcnn_r50_fpn_lvis,
        "gs_faster_rcnn_r50": zoo.gs_faster_rcnn_r50_fpn_lvis,
        "faster_rcnn_x101": zoo.faster_rcnn_x101_64x4d_fpn_lvis,
    }
    det_cfg, _ = builders[model_name]()
    partition = None
    if det_cfg.bbox_head.use_gs:
        partition = (
            load_partition(partition_path)
            if partition_path
            else synthetic_partition(det_cfg.bbox_head.num_classes)
        )
    model = build_detector(det_cfg, partition=partition, dtype=dtype)
    h, w = det_cfg.image_size
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)))
    if checkpoint:
        loaded = restore_checkpoint(checkpoint)
        variables = {
            "params": loaded.get("params", loaded),
            "batch_stats": loaded.get("batch_stats", variables.get("batch_stats", {})),
        }
    return Detector(model, variables, det_cfg)


def inference_detector(detector: Detector, image: np.ndarray):
    """Single-image inference (apis/inference.py inference_detector parity)."""
    return detector(image)


def show_result(
    image: np.ndarray,
    detections: List[dict],
    class_names: Optional[Tuple[str, ...]] = None,
    score_thr: float = 0.3,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Draw detections on the image (base.py show_result parity)."""
    import cv2

    img = image.copy()
    for det in detections:
        if det["score"] < score_thr:
            continue
        x1, y1, x2, y2 = [int(round(v)) for v in det["bbox"]]
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
        name = (
            class_names[det["label"]]
            if class_names is not None
            else str(det["category_id"])
        )
        cv2.putText(
            img, f"{name} {det['score']:.2f}", (x1, max(y1 - 3, 10)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
        )
    if out_file:
        cv2.imwrite(out_file, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return img

#!/usr/bin/env python
"""τ-norm calibration sweep + per-bin proposal classification accuracy.

Parity: /root/reference/tools/test_lvis_tnorm.py — evaluates how well the
classifier head ranks proposals per frequency bin (`accumulate_acc`
:24-42, per-bin splits :89-143) and sweeps the τ-normalization exponent of
fc_cls row norms (reweight_cls, tools/test_lvis.py:135-159).

Reports, for each instance-count bin (the GS partition's bins), the top-1
classification accuracy of RoIs assigned to GT of that bin — the
diagnostic the BAGS paper uses to show head imbalance.

Usage:
  python tools/test_lvis_tnorm.py --model faster_rcnn_r50 \
      --ann data/lvis/lvis_v0.5_val.json --img-prefix data/lvis/val2017 \
      --checkpoint ckpt --partition data/lvis/gs_partition.npz \
      --taus 0.0 0.5 1.0
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="faster_rcnn_r50")
    p.add_argument("--ann", required=True)
    p.add_argument("--img-prefix", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--partition", required=True, help="gs partition npz (bin map)")
    p.add_argument("--taus", type=float, nargs="+", default=[0.0])
    p.add_argument("--limit", type=int, default=500)
    p.add_argument("--iou-thr", type=float, default=0.5)
    return p.parse_args()


def main():
    args = parse_args()
    from balancedgroupsoftmax_tpu import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import cv2

    from balancedgroupsoftmax_tpu import zoo
    from balancedgroupsoftmax_tpu.data.lvis import LvisDataset
    from balancedgroupsoftmax_tpu.data.pipeline import PipelineConfig, preprocess_image
    from balancedgroupsoftmax_tpu.gs.partition import load_partition
    from balancedgroupsoftmax_tpu.models.detector import build_detector
    from balancedgroupsoftmax_tpu.utils.checkpoint import restore_checkpoint
    from tools.test_lvis import tau_norm

    builders = {
        "faster_rcnn_r50": zoo.faster_rcnn_r50_fpn_lvis,
        "gs_faster_rcnn_r50": zoo.gs_faster_rcnn_r50_fpn_lvis,
    }
    det_cfg, _ = builders[args.model]()
    partition = load_partition(args.partition)
    ds = LvisDataset(args.ann, args.img_prefix, test_mode=True)
    pcfg = PipelineConfig()

    loaded = restore_checkpoint(args.checkpoint)
    base_params = loaded["params"] if "params" in loaded else loaded
    batch_stats = loaded.get("batch_stats", {})

    for tau in args.taus:
        params = tau_norm(base_params, tau) if tau else base_params
        det_cfg_b = dataclasses.replace(det_cfg, image_size=(800, 1344))
        model = build_detector(
            det_cfg_b,
            partition=partition if det_cfg.bbox_head.use_gs else None,
        )

        # per-bin accuracy accumulators (accumulate_acc parity)
        correct = np.zeros(partition.num_bins, np.int64)
        total = np.zeros(partition.num_bins, np.int64)

        @jax.jit
        def classify_gt_rois(variables, images, rois):
            feats = model.apply(variables, images, method="extract_feats")
            from balancedgroupsoftmax_tpu.ops.roi_align import multilevel_roi_align

            pooled = jax.vmap(
                lambda f, r: multilevel_roi_align(
                    f, r, det_cfg.roi_extractor.featmap_strides
                )
            )(feats[:4], rois)
            cls_logits, _ = model.apply(variables, pooled, method="roi_head")
            return cls_logits

        variables = {"params": params, "batch_stats": batch_stats}
        n = min(len(ds), args.limit)
        cap = 64
        for idx in range(n):
            ann = ds.get_ann_info(idx)
            if len(ann["labels"]) == 0:
                continue
            from balancedgroupsoftmax_tpu.data.pipeline import preprocess_image_file

            s = preprocess_image_file(
                ds.image_path(idx), ann["bboxes"], ann["labels"], pcfg, False
            )
            if s["bucket"] != (800, 1344):
                continue
            k = min(len(ann["labels"]), cap)
            rois = np.zeros((cap, 4), np.float32)
            rois[:k] = np.asarray(s["gt_boxes"])[:k]
            logits = np.asarray(
                classify_gt_rois(
                    variables, jnp.asarray(s["image"][None]), jnp.asarray(rois[None])
                )
            )[0]
            if det_cfg.bbox_head.use_gs:
                from balancedgroupsoftmax_tpu.gs.head import gs_merge_scores

                scores = np.asarray(gs_merge_scores(jnp.asarray(logits), partition))
            else:
                scores = jax.nn.softmax(jnp.asarray(logits), axis=-1)
                scores = np.asarray(scores)
            pred = scores[:k, 1:].argmax(-1) + 1
            labels = np.asarray(s["gt_labels"])[:k]
            for p_, l_ in zip(pred, labels):
                b = partition.label2bin[l_]
                total[b] += 1
                correct[b] += int(p_ == l_)

        names = ["bg/fg", "(0,10)", "[10,100)", "[100,1000)", "[1000,~)"][: partition.num_bins]
        accs = {
            names[b]: round(correct[b] / total[b], 4) if total[b] else None
            for b in range(partition.num_bins)
        }
        print(json.dumps(dict(tau=tau, per_bin_accuracy=accs,
                              counts=total.tolist())))


if __name__ == "__main__":
    main()

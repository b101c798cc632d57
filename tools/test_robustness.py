#!/usr/bin/env python
"""Corruption robustness benchmark.

Parity: /root/reference/tools/test_robustness.py + robustness_eval.py —
evaluate a detector on LVIS val under each corruption type x severity and
report per-corruption mAP plus mPC (mean performance under corruption) and
rPC (relative).

Usage:
  python tools/test_robustness.py --model gs_faster_rcnn_r50 \
      --ann ... --img-prefix ... --checkpoint ... --partition ... \
      --corruptions gaussian_noise motion_blur --severities 1 3 5 --limit 200
"""

import argparse
import json
import subprocess
import sys

sys.path.insert(0, ".")

import numpy as np


def parse_args():
    from balancedgroupsoftmax_tpu.data.corruptions import CORRUPTIONS

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="gs_faster_rcnn_r50")
    p.add_argument("--ann", required=True)
    p.add_argument("--img-prefix", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--partition", default=None)
    p.add_argument("--corruptions", nargs="+", default=list(CORRUPTIONS),
                   choices=list(CORRUPTIONS) + ["benchmark"])
    p.add_argument("--severities", type=int, nargs="+", default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", default="robustness_results.json")
    return p.parse_args()


def main():
    args = parse_args()
    from balancedgroupsoftmax_tpu import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses
    import cv2
    import jax
    import jax.numpy as jnp

    from balancedgroupsoftmax_tpu import zoo
    from balancedgroupsoftmax_tpu.data.corruptions import corrupt
    from balancedgroupsoftmax_tpu.data.lvis import LvisDataset
    from balancedgroupsoftmax_tpu.data.pipeline import (
        LANDSCAPE_BUCKET, PORTRAIT_BUCKET, PipelineConfig, preprocess_image,
    )
    from balancedgroupsoftmax_tpu.eval.lvis_eval import LvisEvaluator
    from balancedgroupsoftmax_tpu.eval.results import detections_to_records
    from balancedgroupsoftmax_tpu.gs.partition import load_partition
    from balancedgroupsoftmax_tpu.models.detector import build_detector
    from balancedgroupsoftmax_tpu.utils.checkpoint import restore_checkpoint

    builders = {
        "faster_rcnn_r50": zoo.faster_rcnn_r50_fpn_lvis,
        "gs_faster_rcnn_r50": zoo.gs_faster_rcnn_r50_fpn_lvis,
    }
    det_cfg, _ = builders[args.model]()
    partition = load_partition(args.partition) if args.partition else None
    ds = LvisDataset(args.ann, args.img_prefix, test_mode=True)
    pcfg = PipelineConfig()
    loaded = restore_checkpoint(args.checkpoint)
    variables = {
        "params": loaded.get("params", loaded),
        "batch_stats": loaded.get("batch_stats", {}),
    }

    fns = {}
    for bucket in (LANDSCAPE_BUCKET, PORTRAIT_BUCKET):
        cfg_b = dataclasses.replace(det_cfg, image_size=bucket)
        m = build_detector(cfg_b, partition=partition)
        fns[bucket] = jax.jit(
            lambda v, im, sh, sf, m=m: m.apply(v, im, sh, sf, method="predict")
        )

    with open(args.ann) as f:
        gt = json.load(f)
    n = min(len(ds), args.limit or len(ds))
    keep_ids = {ds.img_infos[i]["id"] for i in range(n)}
    gt["images"] = [i for i in gt["images"] if i["id"] in keep_ids]
    gt["annotations"] = [a for a in gt["annotations"] if a["image_id"] in keep_ids]

    def run_eval(corruption, severity):
        records = []
        for idx in range(n):
            img = cv2.cvtColor(cv2.imread(ds.image_path(idx)), cv2.COLOR_BGR2RGB)
            if severity > 0:
                img = corrupt(img, corruption, severity, seed=idx)
            s = preprocess_image(
                img, np.zeros((0, 4), np.float32), np.zeros(0, np.int32), pcfg, False
            )
            dets = fns[s["bucket"]](
                variables,
                jnp.asarray(s["image"][None]),
                jnp.asarray(s["img_shape"][None]),
                jnp.asarray([s["scale_factor"]]),
            )
            records.extend(
                detections_to_records(
                    ds.img_infos[idx]["id"],
                    np.asarray(dets.boxes[0]), np.asarray(dets.scores[0]),
                    np.asarray(dets.labels[0]), np.asarray(dets.valid[0]),
                    ds.cat_ids,
                )
            )
        ev = LvisEvaluator(gt, records)
        return dict(ev.run())

    results = {}
    clean_ap = None
    for corruption in args.corruptions:
        for severity in args.severities:
            if severity == 0 and clean_ap is not None:
                continue
            key = f"{corruption}_s{severity}" if severity else "clean"
            res = run_eval(corruption, severity)
            results[key] = res
            if severity == 0:
                clean_ap = res["AP"]
            print(json.dumps({key: round(res["AP"], 4)}), flush=True)

    # mPC / rPC (robustness_eval.py summary parity)
    corr_aps = [v["AP"] for k, v in results.items() if k != "clean"]
    summary = dict(
        clean_AP=clean_ap,
        mPC=float(np.mean(corr_aps)) if corr_aps else None,
        rPC=float(np.mean(corr_aps) / clean_ap) if corr_aps and clean_ap else None,
    )
    print(json.dumps(summary))
    with open(args.out, "w") as f:
        json.dump(dict(results=results, summary=summary), f)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Standalone LVIS evaluation of a result JSON.

Parity: /root/reference/tools/eval_lvis.py — result file + annotation file
-> federated metric table.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

from balancedgroupsoftmax_tpu.eval.lvis_eval import LvisEvaluator


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True)
    p.add_argument("--result", required=True)
    p.add_argument("--iou-type", default="bbox", choices=["bbox"])
    p.add_argument("--max-dets", type=int, default=300)
    p.add_argument("--protocol", default="lvis", choices=["lvis", "coco"],
                   help="lvis = federated (neg_category_ids filtering); "
                        "coco = every category scored on every image")
    args = p.parse_args()

    with open(args.ann) as f:
        gt = json.load(f)
    with open(args.result) as f:
        dets = json.load(f)
    ev = LvisEvaluator(gt, dets, iou_type=args.iou_type,
                       max_dets=args.max_dets,
                       federated=args.protocol == "lvis")
    ev.run()
    ev.print_results()


if __name__ == "__main__":
    main()

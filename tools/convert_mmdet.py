#!/usr/bin/env python
"""Convert a released mmdet-v1 (reference) .pth checkpoint to our format.

The one-command half of the real-LVIS parity recipe (ROADMAP.md): the day
the environment has the LVIS v0.5 data and the reference's released
checkpoints (README.md:225-248 model zoo), this converts e.g.
gs_faster_rcnn_r50_fpn_1x released weights into an orbax checkpoint our
tools/test_lvis.py can evaluate directly:

  python tools/convert_mmdet.py --pth gs_faster_r50.pth \
      --out work_dirs/converted/gs_faster_r50
  BAGS_PLATFORM=tpu python tools/test_lvis.py --model gs_faster_rcnn_r50 \
      --ann data/lvis/lvis_v0.5_val.json --img-prefix data/lvis/val2017 \
      --partition data/lvis/gs_partition.npz \
      --checkpoint work_dirs/converted/gs_faster_r50 --out results.json

Target numbers: 25.96 bbox mAP (BAGS, /root/reference/README.md:238),
20.98 (plain baseline, :225). The name-map conversion itself is validated
against the real reference model modules in
tests/test_mmdet_convert_functional.py.
"""

import argparse
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("BAGS_PLATFORM", "cpu")  # conversion is host-side work

KNOWN_PREFIXES = {
    "backbone", "neck", "rpn_head", "bbox_head", "mask_head", "semantic_head",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True, help="mmdet v1 checkpoint (.pth)")
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    p.add_argument("--depth", type=int, default=50, choices=(50, 101, 152))
    p.add_argument("--roi-size", type=int, default=7)
    p.add_argument("--roi-channels", type=int, default=256)
    args = p.parse_args()

    import torch

    from balancedgroupsoftmax_tpu import apply_platform_override

    apply_platform_override()
    from balancedgroupsoftmax_tpu.utils.checkpoint import (
        convert_mmdet_faster_rcnn,
        save_checkpoint,
    )

    blob = torch.load(args.pth, map_location="cpu")
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    print(f"loaded {len(sd)} tensors from {args.pth}")
    if "meta" in blob and isinstance(blob["meta"], dict):
        meta = blob["meta"]
        print(f"  meta: mmdet {meta.get('mmdet_version')}, "
              f"epoch {meta.get('epoch')}")

    unknown = sorted({k.split(".")[0] for k in sd} - KNOWN_PREFIXES)
    if unknown:
        print(f"WARNING: unmapped top-level modules (left unconverted): "
              f"{unknown}", file=sys.stderr)

    params, stats = convert_mmdet_faster_rcnn(
        sd, depth=args.depth, roi_size=args.roi_size,
        roi_channels=args.roi_channels,
    )
    heads = [k for k in params if k != "backbone"]
    print(f"converted: backbone (depth {args.depth}) + {heads}")
    save_checkpoint(os.path.abspath(args.out),
                    {"params": params, "batch_stats": stats})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

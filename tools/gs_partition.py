#!/usr/bin/env python
"""Generate the BAGS group-partition file from LVIS annotations.

Equivalent of /root/reference/tools/lvis_analyse.py get_cate_gs/get_split
(SURVEY.md §2.1): writes one .npz holding label2binlabel / pred_slice /
label2logit / label2bin (see balancedgroupsoftmax_tpu/gs/partition.py for
the layout). Supports the 2/5/8-bin ablations via --thresholds.

Usage:
  python tools/gs_partition.py --ann data/lvis/lvis_v0.5_train.json \
      --out data/lvis/gs_partition.npz
  python tools/gs_partition.py --ann ... --thresholds 100       # 2-bin
  python tools/gs_partition.py --ann ... --thresholds 5 10 50 100 500 1000 5000  # 8-bin
"""

import argparse
import sys

sys.path.insert(0, ".")

from balancedgroupsoftmax_tpu.gs.partition import (
    partition_from_lvis,
    save_partition,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True, help="LVIS train annotation json")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--num-classes", type=int, default=1231)
    p.add_argument(
        "--thresholds",
        type=int,
        nargs="+",
        default=[10, 100, 1000],
        help="instance-count bin edges (paper default 10 100 1000)",
    )
    args = p.parse_args()

    part = partition_from_lvis(args.ann, args.num_classes, tuple(args.thresholds))
    save_partition(args.out, part)
    print(
        f"wrote {args.out}: {part.num_bins} bins, slice sizes {part.bin_sizes}, "
        f"{part.num_logits} logits"
    )


if __name__ == "__main__":
    main()

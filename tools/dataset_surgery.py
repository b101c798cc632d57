#!/usr/bin/env python
"""Dataset surgery utilities (the reference's offline analysis family).

Parity: /root/reference/tools/lvis_analyse.py:682-1211 — head-only dataset
construction (`del_tail`), class-subset filtering with id remapping
(`del_nondense_cls`/`update_cls`), density-based train/val re-splitting
(`construct_data`/`get_dense_det`), and instance-count statistics
(`get_hist`/`count_ins`). Operates on any COCO/LVIS-format JSON.

Usage:
  python tools/dataset_surgery.py stats --ann lvis_train.json
  python tools/dataset_surgery.py filter-tail --ann A.json --out B.json --min-count 100
  python tools/dataset_surgery.py filter-classes --ann A.json --out B.json --keep 1 5 7
  python tools/dataset_surgery.py split-dense --ann A.json --out-prefix dense \
      --low 20 --high 40
"""

import argparse
import json
import sys
from collections import defaultdict

import numpy as np


def load(ann):
    with open(ann) as f:
        return json.load(f)


def save(data, path):
    with open(path, "w") as f:
        json.dump(data, f)
    print(f"wrote {path}: {len(data['images'])} images, "
          f"{len(data['annotations'])} anns, {len(data['categories'])} cats")


def stats(args):
    data = load(args.ann)
    counts = defaultdict(int)
    for a in data["annotations"]:
        counts[a["category_id"]] += 1
    vals = np.array([counts.get(c["id"], 0) for c in data["categories"]])
    per_img = defaultdict(int)
    for a in data["annotations"]:
        per_img[a["image_id"]] += 1
    ipi = np.array(list(per_img.values()) or [0])
    print(json.dumps(dict(
        num_images=len(data["images"]),
        num_annotations=len(data["annotations"]),
        num_categories=len(data["categories"]),
        instance_count=dict(
            min=int(vals.min()), median=float(np.median(vals)),
            max=int(vals.max()),
            bins={"(0,10)": int(((vals > 0) & (vals < 10)).sum()),
                  "[10,100)": int(((vals >= 10) & (vals < 100)).sum()),
                  "[100,1000)": int(((vals >= 100) & (vals < 1000)).sum()),
                  "[1000,~)": int((vals >= 1000).sum()),
                  "empty": int((vals == 0).sum())},
        ),
        instances_per_image=dict(
            mean=float(ipi.mean()), max=int(ipi.max()),
            over_20=int((ipi >= 20).sum()), over_40=int((ipi >= 40).sum()),
        ),
    ), indent=1))


def filter_tail(args):
    """Keep only classes with >= min-count instances (del_tail parity:
    the head-only dataset used for dense-detection experiments)."""
    data = load(args.ann)
    counts = defaultdict(int)
    for a in data["annotations"]:
        counts[a["category_id"]] += 1
    keep = {c["id"] for c in data["categories"] if counts[c["id"]] >= args.min_count}
    _filter_and_save(data, keep, args.out, args.remap)


def filter_classes(args):
    _filter_and_save(load(args.ann), set(args.keep), args.out, args.remap)


def _filter_and_save(data, keep_ids, out, remap):
    anns = [a for a in data["annotations"] if a["category_id"] in keep_ids]
    img_ids = {a["image_id"] for a in anns}
    data["annotations"] = anns
    data["images"] = [i for i in data["images"] if i["id"] in img_ids]
    data["categories"] = [c for c in data["categories"] if c["id"] in keep_ids]
    if remap:  # contiguous 1-based ids (update_cls parity)
        mapping = {c["id"]: i + 1 for i, c in enumerate(
            sorted(data["categories"], key=lambda c: c["id"]))}
        for c in data["categories"]:
            c["id"] = mapping[c["id"]]
        for a in data["annotations"]:
            a["category_id"] = mapping[a["category_id"]]
        for i in data["images"]:
            for k in ("neg_category_ids", "not_exhaustive_category_ids"):
                if k in i:
                    i[k] = [mapping[c] for c in i[k] if c in mapping]
    save(data, out)


def split_dense(args):
    """Re-split by per-image instance density (construct_data parity):
    sparse images (<low or >300) go to train; mid/high-density images split
    per-category half-and-half between train and the two val densities."""
    rng = np.random.RandomState(args.seed)
    data = load(args.ann)
    per_img = defaultdict(list)
    for a in data["annotations"]:
        per_img[a["image_id"]].append(a)

    sparse, mid, high = [], [], []
    for img_id, anns in per_img.items():
        n = len(anns)
        (sparse if (n < args.low or n > 300) else mid if n < args.high else high
         ).append(img_id)

    def half_split(group):
        cat2img = defaultdict(set)
        for im in group:
            for a in per_img[im]:
                cat2img[a["category_id"]].add(im)
        val = set()
        for cid, imgs in cat2img.items():
            want = len(imgs) // 2 - len(imgs & val)
            rest = list(imgs - val)
            if want > 0 and rest:
                for i in rng.choice(len(rest), min(want, len(rest)), replace=False):
                    val.add(rest[int(i)])
        return val

    val_mid = half_split(mid)
    val_high = half_split(high)
    train_ids = set(sparse) | (set(mid) - val_mid) | (set(high) - val_high)
    val_ids = val_mid | val_high

    def subset(ids):
        d = dict(data)
        d["images"] = [i for i in data["images"] if i["id"] in ids]
        d["annotations"] = [a for a in data["annotations"] if a["image_id"] in ids]
        return d

    save(subset(train_ids), f"{args.out_prefix}_train.json")
    save(subset(val_ids), f"{args.out_prefix}_val.json")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("stats")
    s.add_argument("--ann", required=True)
    s.set_defaults(fn=stats)

    s = sub.add_parser("filter-tail")
    s.add_argument("--ann", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--min-count", type=int, default=100)
    s.add_argument("--remap", action="store_true")
    s.set_defaults(fn=filter_tail)

    s = sub.add_parser("filter-classes")
    s.add_argument("--ann", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--keep", type=int, nargs="+", required=True)
    s.add_argument("--remap", action="store_true")
    s.set_defaults(fn=filter_classes)

    s = sub.add_parser("split-dense")
    s.add_argument("--ann", required=True)
    s.add_argument("--out-prefix", required=True)
    s.add_argument("--low", type=int, default=20)
    s.add_argument("--high", type=int, default=40)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=split_dense)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()

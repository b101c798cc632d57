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


def _norm_name(n):
    return n.strip().lower().replace("_", " ").replace("-", " ")


def merge_coco(args):
    """Merge a COCO-format annotation file into an LVIS-format one by
    category NAME (lvis_analyse.py:145-183 `ana_coco_param` + the paper's
    COCO-pretraining experiments parity): COCO categories are matched
    against LVIS names/synonyms, COCO annotations are remapped to LVIS
    category ids, and image/ann ids are offset to avoid collisions.
    Unmatched COCO categories are dropped and reported. instance_count /
    image_count / frequency are recomputed on the merged set."""
    lvis = load(args.ann)
    coco = load(args.coco_ann)

    name2lvis = {}
    for c in lvis["categories"]:
        name2lvis[_norm_name(c["name"])] = c["id"]
        for syn in c.get("synonyms", []):
            name2lvis.setdefault(_norm_name(syn), c["id"])

    cat_map, dropped = {}, []
    for c in coco["categories"]:
        lid = name2lvis.get(_norm_name(c["name"]))
        if lid is None:
            dropped.append(c["name"])
        else:
            cat_map[c["id"]] = lid
    print(f"matched {len(cat_map)}/{len(coco['categories'])} COCO categories"
          + (f"; dropped: {dropped}" if dropped else ""))

    img_off = max((i["id"] for i in lvis["images"]), default=0) + 1
    ann_off = max((a["id"] for a in lvis["annotations"]), default=0) + 1
    # LVIS v0.5 images ARE COCO images: share by file_name when present.
    lvis_files = {i["file_name"].split("/")[-1]: i["id"] for i in lvis["images"]}
    coco_img_map, shared = {}, 0
    for i in coco["images"]:
        fname = i["file_name"].split("/")[-1]
        if fname in lvis_files:
            coco_img_map[i["id"]] = lvis_files[fname]
            shared += 1
        else:
            new = dict(i)
            new["id"] = img_off
            new.setdefault("neg_category_ids", [])
            new.setdefault("not_exhaustive_category_ids", [])
            coco_img_map[i["id"]] = img_off
            lvis["images"].append(new)
            img_off += 1
    print(f"{shared} shared images, {len(coco['images']) - shared} new")

    kept = 0
    for a in coco["annotations"]:
        if a["category_id"] not in cat_map:
            continue
        new = dict(a)
        new["id"] = ann_off
        new["category_id"] = cat_map[a["category_id"]]
        new["image_id"] = coco_img_map[a["image_id"]]
        lvis["annotations"].append(new)
        ann_off += 1
        kept += 1
    print(f"merged {kept} COCO annotations")

    counts, img_sets = defaultdict(int), defaultdict(set)
    for a in lvis["annotations"]:
        counts[a["category_id"]] += 1
        img_sets[a["category_id"]].add(a["image_id"])
    for c in lvis["categories"]:
        c["instance_count"] = counts[c["id"]]
        c["image_count"] = len(img_sets[c["id"]])
        c["frequency"] = ("r" if c["image_count"] < 10
                          else "c" if c["image_count"] < 100 else "f")
    save(lvis, args.out)


def weight_stats(args):
    """Per-class fc_cls weight norms (lvis_analyse.py:185-270
    `load_checkpoint`/`load_checkpoint_all` parity — the diagnostic behind
    the paper's Fig. 2: classifier weight norm collapses with instance
    count). With --partition, GS logit norms are mapped back to class order
    via label2logit. Prints per-frequency-bin means; --out saves the npz."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ".")
    from balancedgroupsoftmax_tpu.utils.checkpoint import restore_checkpoint

    ck = restore_checkpoint(args.checkpoint)
    params = ck["params"] if "params" in ck else ck
    head = params["bbox_head"]
    cls_w = np.asarray(head["fc_cls"]["kernel"])  # (in, num_logits)
    cls_norm = np.linalg.norm(cls_w, axis=0)
    reg_w = np.asarray(head["fc_reg"]["kernel"])
    reg_norm = np.linalg.norm(reg_w, axis=0).reshape(-1, 4).mean(-1)

    out = dict(cls_norm=cls_norm, cls_bias=np.asarray(head["fc_cls"]["bias"]),
               reg_norm=reg_norm)
    if args.partition:
        d = np.load(args.partition, allow_pickle=True)
        out["gs_cls_norm_by_class"] = cls_norm[d["label2logit"]]
        cls_by_class = out["gs_cls_norm_by_class"]
    else:
        cls_by_class = cls_norm

    if args.ann:
        data = load(args.ann)
        counts = defaultdict(int)
        for a in data["annotations"]:
            counts[a["category_id"]] += 1
        bins = {"(0,10)": (1, 10), "[10,100)": (10, 100),
                "[100,1000)": (100, 1000), "[1000,~)": (1000, 1 << 60)}
        report = {}
        for name, (lo, hi) in bins.items():
            ids = [c["id"] for c in data["categories"] if lo <= counts[c["id"]] < hi]
            ids = [i for i in ids if i < len(cls_by_class)]
            report[name] = round(float(np.mean(cls_by_class[ids])), 4) if ids else None
        print(json.dumps(dict(mean_cls_norm_by_bin=report)))

    if args.out:
        np.savez(args.out, **out)
        print(f"wrote {args.out}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


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

    s = sub.add_parser("merge-coco")
    s.add_argument("--ann", required=True, help="LVIS-format annotation json")
    s.add_argument("--coco-ann", required=True, help="COCO-format annotation json")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=merge_coco)

    s = sub.add_parser("weight-stats")
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--partition", default=None)
    s.add_argument("--ann", default=None, help="for per-frequency-bin means")
    s.add_argument("--out", default=None, help="npz output path")
    s.set_defaults(fn=weight_stats)

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

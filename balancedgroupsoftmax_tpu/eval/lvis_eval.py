"""Federated LVIS evaluator — numpy reimplementation of the vendored lvis-api.

Parity target: /root/reference/lvis-api/lvis/eval.py (LVISEval) and
results.py (LVISResults). All LVIS-specific rules reproduced:

- 300 detections/image cap at load time (results.py:73-85);
- federated filtering: detections for categories neither present in the
  image's GT nor in its `neg_category_ids` are dropped before matching
  (eval.py:84-104);
- unmatched detections of categories in `not_exhaustive_category_ids` are
  ignored, not false positives (eval.py:269-280);
- COCO-style greedy matching per (image, category, IoU thr) with
  ignore-last gt ordering (eval.py:234-265), area ranges 0/32^2/96^2/1e10,
  101-point interpolated precision (eval.py:375-401), iou thresholds
  .5:.05:.95;
- frequency groups r/c/f from the categories' `frequency` field
  (eval.py:107-114) for APr/APc/APf;
- box IoU on xywh boxes with NO +1 offset (pycocotools mask_utils.iou
  semantics — the evaluator convention differs from the training-time one).

Detections enter as plain dicts {image_id, category_id, bbox [x,y,w,h],
score} — the same JSON records the reference writes (lvis_utils.py:98-130).
"""

from __future__ import annotations

from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10, endpoint=True)
REC_THRS = np.linspace(0.0, 1.0, 101, endpoint=True)
AREA_RNG = [
    [0.0, 1e10],
    [0.0, 32.0**2],
    [32.0**2, 96.0**2],
    [96.0**2, 1e10],
]
AREA_LBL = ["all", "small", "medium", "large"]


def box_iou_xywh(dt: np.ndarray, gt: np.ndarray, iscrowd=None) -> np.ndarray:
    """(D, G) IoU on xywh boxes, pycocotools bbIou semantics (no +1)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dt = np.asarray(dt, np.float64)
    gt = np.asarray(gt, np.float64)
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    iw = np.clip(
        np.minimum(dx2[:, None], gx2[None, :]) - np.maximum(dx1[:, None], gx1[None, :]),
        0,
        None,
    )
    ih = np.clip(
        np.minimum(dy2[:, None], gy2[None, :]) - np.maximum(dy1[:, None], gy1[None, :]),
        0,
        None,
    )
    inter = iw * ih
    darea = dt[:, 2] * dt[:, 3]
    garea = gt[:, 2] * gt[:, 3]
    if iscrowd is None:
        iscrowd = np.zeros(len(gt), bool)
    union = np.where(
        np.asarray(iscrowd, bool)[None, :],
        darea[:, None],
        darea[:, None] + garea[None, :] - inter,
    )
    return inter / np.maximum(union, 1e-12)


class LvisEvaluator:
    def __init__(
        self,
        gt_data: dict,  # parsed LVIS annotation JSON (images/annotations/categories)
        detections: List[dict],  # result records
        iou_type: str = "bbox",
        max_dets: int = 300,
        compute_mask_iou=None,  # callable(dt_masks, gt_anns) for segm
        federated: bool = True,
    ):
        """federated=False evaluates COCO-protocol (every category scored
        on every image): COCO/Cityscapes-schema files carry no
        neg_category_ids, so the LVIS federated filter would silently
        delete every cross-class false positive and inflate AP."""
        assert iou_type in ("bbox", "segm")
        self.iou_type = iou_type
        self.max_dets = max_dets
        self.federated = federated
        self.compute_mask_iou = compute_mask_iou
        self.results = OrderedDict()

        self.img_ids = sorted(i["id"] for i in gt_data["images"])
        self.cat_ids = sorted(c["id"] for c in gt_data["categories"])
        self.cats = {c["id"]: c for c in gt_data["categories"]}
        self.imgs = {i["id"]: i for i in gt_data["images"]}

        # --- LVISResults: cap at max_dets per image by score ---------------
        by_img: Dict[int, List[dict]] = defaultdict(list)
        for d in detections:
            if iou_type == "segm" and "segm_score" in d:
                # Mask-Scoring R-CNN: segm records score as det_score x
                # predicted mask IoU (mmdet segm2json writes the mask
                # score into the segm json; our single records list keeps
                # it under a separate key so bbox eval is unaffected)
                d = dict(d, score=d["segm_score"])
            by_img[d["image_id"]].append(d)
        self.dts_by_img_cat: Dict[tuple, List[dict]] = defaultdict(list)
        next_id = 1
        for img_id, dts in by_img.items():
            dts = sorted(dts, key=lambda d: -d["score"])[: self.max_dets]
            for d in dts:
                d = dict(d)
                d["id"] = next_id
                next_id += 1
                if "area" not in d:
                    # LVISResults precedence (lvis-api/lvis/results.py:42-62):
                    # a det that carries "bbox" gets w*h area even in segm
                    # mode; segm-only dets (what segm2json emits,
                    # mmdet/core/evaluation/lvis_utils.py:165-172) get RLE
                    # mask area and a mask-derived bbox.
                    if "bbox" in d:
                        d["area"] = float(d["bbox"][2] * d["bbox"][3])
                    else:
                        from ..utils.rle import decode_rle, rle_area

                        d["area"] = float(rle_area(d["segmentation"]))
                        m = decode_rle(d["segmentation"])
                        ys, xs = np.nonzero(m)
                        d["bbox"] = (
                            [0.0, 0.0, 0.0, 0.0]
                            if len(xs) == 0
                            else [
                                float(xs.min()),
                                float(ys.min()),
                                float(xs.max() - xs.min() + 1),
                                float(ys.max() - ys.min() + 1),
                            ]
                        )
                self.dts_by_img_cat[(img_id, d["category_id"])].append(d)

        # --- GT index ------------------------------------------------------
        self.gts_by_img_cat: Dict[tuple, List[dict]] = defaultdict(list)
        img_pl: Dict[int, set] = defaultdict(set)
        for ann in gt_data["annotations"]:
            ann = dict(ann)
            ann.setdefault("ignore", 0)
            self.gts_by_img_cat[(ann["image_id"], ann["category_id"])].append(ann)
            img_pl[ann["image_id"]].add(ann["category_id"])
        self.img_pl = img_pl
        self.img_nl = {
            i["id"]: set(i.get("neg_category_ids", [])) for i in gt_data["images"]
        }
        self.img_nel = {
            i["id"]: set(i.get("not_exhaustive_category_ids", []))
            for i in gt_data["images"]
        }

        # federated filter on detections (eval.py:99-104); COCO protocol
        # keeps everything — cross-class FPs must count
        if self.federated:
            for (img_id, cat_id) in list(self.dts_by_img_cat.keys()):
                if cat_id not in self.img_nl.get(img_id, set()) and cat_id not in img_pl[
                    img_id
                ]:
                    del self.dts_by_img_cat[(img_id, cat_id)]

        # frequency groups (eval.py:107-114); fall back to image_count bins
        self.freq_groups = [[], [], []]
        lbl = {"r": 0, "c": 1, "f": 2}
        for idx, cid in enumerate(self.cat_ids):
            cat = self.cats[cid]
            if "frequency" in cat:
                self.freq_groups[lbl[cat["frequency"]]].append(idx)
            else:
                n = cat.get("image_count", 100)
                self.freq_groups[0 if n < 10 else (1 if n < 100 else 2)].append(idx)

    # --- per-(img, cat) evaluation ---------------------------------------
    def _default_mask_iou(self, dts, gts):
        """Decode det RLEs / GT polygons+RLEs to bitmaps, IoU via the native
        kernel (lvis-api _to_mask + mask_utils.iou parity)."""
        from .. import native
        from ..utils.rle import decode_rle, segmentation_to_mask

        if not dts or not gts:
            return np.zeros((len(dts), len(gts)))
        img = self.imgs[gts[0]["image_id"]]
        h, w = img["height"], img["width"]
        dm = np.stack(
            [decode_rle(d["segmentation"]).reshape(-1) for d in dts]
        ).astype(np.uint8)
        gm = np.stack(
            [
                segmentation_to_mask(g["segmentation"], h, w).reshape(-1)
                for g in gts
            ]
        ).astype(np.uint8)
        return native.mask_iou_bitmaps(dm, gm)

    def _compute_iou(self, gts, dts):
        idx = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts = [dts[i] for i in idx]
        if self.iou_type == "bbox":
            return box_iou_xywh([d["bbox"] for d in dts], [g["bbox"] for g in gts])
        fn = self.compute_mask_iou or self._default_mask_iou
        return fn(dts, gts)

    def _evaluate_img(self, img_id, cat_id, area_rng, ious_sorted):
        gts = self.gts_by_img_cat.get((img_id, cat_id), [])
        dts = self.dts_by_img_cat.get((img_id, cat_id), [])
        if not gts and not dts:
            return None
        gt_ig0 = np.array(
            [
                1
                if (g["ignore"] or g["area"] < area_rng[0] or g["area"] > area_rng[1])
                else 0
                for g in gts
            ],
            np.int64,
        )
        gt_order = np.argsort(gt_ig0, kind="mergesort")
        gts_s = [gts[i] for i in gt_order]
        gt_ig = gt_ig0[gt_order]
        dt_order = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts_s = [dts[i] for i in dt_order]
        ious = ious_sorted[:, gt_order] if len(gts) else ious_sorted

        t = len(IOU_THRS)
        ng, nd = len(gts_s), len(dts_s)
        gt_m = np.zeros((t, ng))
        dt_m = np.zeros((t, nd))
        dt_ig = np.zeros((t, nd))
        native_done = False
        if nd > 0 and ng > 0:
            from .. import native

            res = native.greedy_match(ious, IOU_THRS, gt_ig)
            if res is not None:
                n_dt_m, n_gt_m, n_dt_ig = res
                gt_ids = np.array([g["id"] for g in gts_s])
                dt_ids = np.array([d["id"] for d in dts_s])
                matched_d = n_dt_m > 0
                dt_m[matched_d] = gt_ids[(n_dt_m[matched_d] - 1).astype(int)]
                matched_g = n_gt_m > 0
                gt_m[matched_g] = dt_ids[(n_gt_m[matched_g] - 1).astype(int)]
                dt_ig = n_dt_ig.astype(np.float64)
                native_done = True
        if not native_done:
            for ti, thr in enumerate(IOU_THRS):
                if nd == 0 or ng == 0:
                    break
                for di in range(nd):
                    best = min(thr, 1 - 1e-10)
                    m = -1
                    for gi in range(ng):
                        if gt_m[ti, gi] > 0:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gi] == 1:
                            break
                        if ious[di, gi] < best:
                            continue
                        best = ious[di, gi]
                        m = gi
                    if m == -1:
                        continue
                    dt_ig[ti, di] = gt_ig[m]
                    dt_m[ti, di] = gts_s[m]["id"]
                    gt_m[ti, m] = dts_s[di]["id"]

        nel = self.img_nel.get(img_id, set())
        dt_ig_mask = np.array(
            [
                d["area"] < area_rng[0]
                or d["area"] > area_rng[1]
                or d["category_id"] in nel
                for d in dts_s
            ],
            bool,
        )[None, :].repeat(t, 0)
        dt_ig = np.logical_or(dt_ig, np.logical_and(dt_m == 0, dt_ig_mask))
        return dict(
            dt_scores=np.array([d["score"] for d in dts_s]),
            dt_matches=dt_m,
            dt_ignore=dt_ig,
            gt_ignore=gt_ig,
        )

    # --- accumulate + summarize ------------------------------------------
    def run(self) -> "OrderedDict[str, float]":
        t = len(IOU_THRS)
        r = len(REC_THRS)
        k = len(self.cat_ids)
        a = len(AREA_RNG)
        precision = -np.ones((t, r, k, a))
        recall = -np.ones((t, k, a))

        active_imgs: Dict[int, List[int]] = defaultdict(list)
        for (img_id, cat_id) in set(self.gts_by_img_cat) | set(self.dts_by_img_cat):
            active_imgs[cat_id].append(img_id)

        for ki, cat_id in enumerate(self.cat_ids):
            imgs = sorted(active_imgs.get(cat_id, []))
            if not imgs:
                continue
            # cache score-sorted ious per image
            per_img = []
            for img_id in imgs:
                gts = self.gts_by_img_cat.get((img_id, cat_id), [])
                dts = self.dts_by_img_cat.get((img_id, cat_id), [])
                ious = self._compute_iou(gts, dts) if (gts or dts) else np.zeros((0, 0))
                per_img.append((img_id, ious))
            for ai, area_rng in enumerate(AREA_RNG):
                E = [
                    self._evaluate_img(img_id, cat_id, area_rng, ious)
                    for img_id, ious in per_img
                ]
                E = [e for e in E if e is not None]
                if not E:
                    continue
                dt_scores = np.concatenate([e["dt_scores"] for e in E])
                order = np.argsort(-dt_scores, kind="mergesort")
                dt_m = np.concatenate([e["dt_matches"] for e in E], axis=1)[:, order]
                dt_ig = np.concatenate([e["dt_ignore"] for e in E], axis=1)[:, order]
                gt_ig = np.concatenate([e["gt_ignore"] for e in E])
                num_gt = int(np.count_nonzero(gt_ig == 0))
                if num_gt == 0:
                    continue
                tps = np.logical_and(dt_m, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dt_m), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for ti in range(t):
                    tp, fp = tp_sum[ti], fp_sum[ti]
                    nd = len(tp)
                    rc = tp / num_gt
                    recall[ti, ki, ai] = rc[-1] if nd else 0
                    pr = tp / (fp + tp + np.spacing(1))
                    # precision envelope (right-max)
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    ins = np.searchsorted(rc, REC_THRS, side="left")
                    pr_at = np.zeros(r)
                    for _i, pi in enumerate(ins):
                        if pi >= nd:
                            break  # reference try/except aborts here
                        pr_at[_i] = pr[pi]
                    precision[ti, :, ki, ai] = pr_at

        self._precision = precision
        self._recall = recall

        def summ(kind, iou_thr=None, area="all", freq=None):
            ai = AREA_LBL.index(area)
            if kind == "ap":
                s = precision
                if iou_thr is not None:
                    s = s[np.where(IOU_THRS == iou_thr)[0]]
                s = s[:, :, self.freq_groups[freq], ai] if freq is not None else s[:, :, :, ai]
            else:
                s = recall
                if iou_thr is not None:
                    s = s[np.where(IOU_THRS == iou_thr)[0]]
                s = s[:, :, ai]
            valid = s[s > -1]
            return float(valid.mean()) if len(valid) else -1.0

        res = self.results
        res["AP"] = summ("ap")
        res["AP50"] = summ("ap", iou_thr=0.5)
        res["AP75"] = summ("ap", iou_thr=0.75)
        res["APs"] = summ("ap", area="small")
        res["APm"] = summ("ap", area="medium")
        res["APl"] = summ("ap", area="large")
        res["APr"] = summ("ap", freq=0)
        res["APc"] = summ("ap", freq=1)
        res["APf"] = summ("ap", freq=2)
        res[f"AR@{self.max_dets}"] = summ("ar")
        res[f"ARs@{self.max_dets}"] = summ("ar", area="small")
        res[f"ARm@{self.max_dets}"] = summ("ar", area="medium")
        res[f"ARl@{self.max_dets}"] = summ("ar", area="large")
        return res

    def print_results(self):
        """Markdown table matching eval.py:485-527."""
        print("\n========================================================")
        print("| Type | IoU | Area | MaxDets | CatIds | Result |")
        print("| :---: | :---: | :---: | :---: | :---: | :---: |")
        for key, value in self.results.items():
            _type = "(AP)" if "AP" in key else "(AR)"
            if len(key) > 2 and key[2].isdigit():
                iou = f"{float(key[2:]) / 100:0.2f}"
            else:
                iou = f"{IOU_THRS[0]:0.2f}:{IOU_THRS[-1]:0.2f}"
            grp = key[2] if len(key) > 2 and key[2] in "rcf" else "all"
            area = key[2] if len(key) > 2 and key[2] in "sml" else "all"
            print(
                f"| {_type:^6} | {iou:<9} | {area:>6s} | {self.max_dets:>3d} |"
                f" {grp:>12s} | {value * 100:2.2f}% |"
            )

#!/usr/bin/env python
"""Inference + LVIS evaluation CLI.

Parity: /root/reference/tools/test_lvis.py — batch inference over LVIS val,
result JSON writing (lvis_utils.py conventions), optional τ-norm classifier
reweighting (--tau, test_lvis.py:135-159), then the federated evaluator.

Usage:
  python tools/test_lvis.py --model gs_faster_rcnn_r50 \
      --ann data/lvis/lvis_v0.5_val.json --img-prefix data/lvis/val2017 \
      --partition data/lvis/gs_partition.npz \
      --checkpoint work_dirs/bags/ckpt_epoch_12 --out results.json
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="faster_rcnn_r50",
                   choices=["faster_rcnn_r50", "gs_faster_rcnn_r50",
                            "faster_rcnn_x101", "mask_rcnn_r50",
                            "gs_mask_rcnn_r50", "cascade_rcnn_r50",
                            "gs_cascade_rcnn_r50", "cascade_rcnn_x101",
                            "gs_cascade_rcnn_x101", "htc_x101",
                            "gs_htc_x101", "gs_htc_dcn_x101",
                            "grid_rcnn_r50", "mask_scoring_rcnn_r50",
                            "double_head_rcnn_r50"])
    p.add_argument("--ann", required=True)
    p.add_argument("--dataset", default="lvis",
                   choices=["lvis", "coco", "cityscapes"],
                   help="annotation dialect: lvis/coco share the reader; "
                        "cityscapes keeps nested file paths and pins the "
                        "8 canonical classes (datasets/cityscapes.py)")
    p.add_argument("--img-prefix", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--partition", default=None)
    p.add_argument("--out", default=None, help="write result records json")
    p.add_argument("--tau", type=float, default=None,
                   help="tau-normalize fc_cls rows by 1/||w||^tau (test_lvis.py:135)")
    p.add_argument("--tau-select", type=float, default=None,
                   help="tau-norm-SELECT (the reference's dual-head test "
                        "path, test_lvis_tnorm.py reweight_cls_newhead + "
                        "test_mixins.py:70-136): score proposals with both "
                        "the original classifier and a tau-normalized copy "
                        "(bg row untouched), and replace a RoI's score row "
                        "with the normalized head's iff its predicted class "
                        "is a tail class (mask.pt rule: instance_count < "
                        "--tail-threshold)")
    p.add_argument("--tail-threshold", type=int, default=100,
                   help="instance-count threshold for the tau-select tail "
                        "mask (lvis_analyse.py get_mask:270-285)")
    p.add_argument("--scale", type=int, nargs=2, default=None,
                   metavar=("LONG", "SHORT"),
                   help="keep-ratio resize target (default 1333 800); must "
                        "match the scale the checkpoint was trained at")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--limit", type=int, default=None, help="eval first N images")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize; each host "
                        "infers its image shard, results are allgathered")
    p.add_argument(
        "--aug-rescore",
        action="store_true",
        help="reference-exact aug-test: merge RPN proposals across views "
        "(merge_aug_proposals), re-score the SHARED proposals on every "
        "view, average mapped-back boxes/scores, single multiclass NMS "
        "(test_mixins.py aug_test_bboxes + merge_augs.py). Combine with "
        "--flip-aug and/or --aug-scales to define the views.",
    )
    p.add_argument(
        "--flip-aug",
        action="store_true",
        help="horizontal-flip TTA: run both orientations, map back, merge by "
        "NMS (MultiScaleFlipAug + merge_augs equivalent at detection level)",
    )
    p.add_argument(
        "--aug-scales",
        type=float,
        nargs="+",
        default=None,
        help="extra scale multipliers for multi-scale TTA (e.g. 0.75 1.25); "
        "each is a full pass at scale*img_scale, detections merged per class "
        "by NMS with the base pass (and flipped passes when --flip-aug)",
    )
    return p.parse_args()


def tau_norm(params, tau: float, skip_bg: bool = False):
    """Scale fc_cls weight rows by 1/||w||^tau (reweight_cls parity).

    The reference normalizes per-class rows of the classifier weight at
    test time; bias left untouched. skip_bg=True leaves class 0's row
    unchanged — the tnorm-select variant (test_lvis_tnorm.py
    reweight_cls_newhead pnorm iterates from row 1)."""
    w = np.asarray(params["bbox_head"]["fc_cls"]["kernel"])  # (in, out)
    norms = np.linalg.norm(w, axis=0, keepdims=True)  # (1, out)
    scale = 1.0 / np.maximum(norms, 1e-12) ** tau
    if skip_bg:
        scale[:, 0] = 1.0
    w = w * scale
    params = dict(params)
    params["bbox_head"] = dict(params["bbox_head"])
    params["bbox_head"]["fc_cls"] = dict(params["bbox_head"]["fc_cls"], kernel=w)
    return params


def main():
    args = parse_args()
    from balancedgroupsoftmax_tpu import enable_compilation_cache

    enable_compilation_cache()
    if args.distributed:
        from balancedgroupsoftmax_tpu.parallel.multihost import init_distributed

        init_distributed()

    from balancedgroupsoftmax_tpu import zoo
    from balancedgroupsoftmax_tpu.data.lvis import LvisDataset
    from balancedgroupsoftmax_tpu.data.pipeline import (
        PipelineConfig, preprocess_image,
    )
    from balancedgroupsoftmax_tpu.eval.lvis_eval import LvisEvaluator
    from balancedgroupsoftmax_tpu.eval.results import detections_to_records
    from balancedgroupsoftmax_tpu.gs.partition import load_partition
    from balancedgroupsoftmax_tpu.models.detector import build_model as build_detector
    from balancedgroupsoftmax_tpu.utils.checkpoint import restore_checkpoint, warm_start

    builders = {
        "faster_rcnn_r50": zoo.faster_rcnn_r50_fpn_lvis,
        "gs_faster_rcnn_r50": zoo.gs_faster_rcnn_r50_fpn_lvis,
        "faster_rcnn_x101": zoo.faster_rcnn_x101_64x4d_fpn_lvis,
        "mask_rcnn_r50": zoo.mask_rcnn_r50_fpn_lvis,
        "gs_mask_rcnn_r50": lambda **kw: zoo.mask_rcnn_r50_fpn_lvis(use_gs=True, **kw),
        "cascade_rcnn_r50": zoo.cascade_rcnn_r50_fpn_lvis,
        "gs_cascade_rcnn_r50": lambda **kw: zoo.cascade_rcnn_r50_fpn_lvis(use_gs=True, **kw),
        "cascade_rcnn_x101": zoo.cascade_rcnn_x101_64x4d_fpn_lvis,
        "gs_cascade_rcnn_x101": lambda **kw: zoo.cascade_rcnn_x101_64x4d_fpn_lvis(use_gs=True, **kw),
        "htc_x101": zoo.htc_x101_64x4d_fpn_lvis,
        "gs_htc_x101": lambda **kw: zoo.htc_x101_64x4d_fpn_lvis(use_gs=True, **kw),
        "gs_htc_dcn_x101": lambda **kw: zoo.htc_x101_64x4d_fpn_lvis(use_gs=True, dcn=True, **kw),
        # detector-assembly variants (models/variants.py); FastRCNN needs
        # precomputed proposals (no RPN) and is API-only — see zoo.fast_rcnn_r50_fpn
        "grid_rcnn_r50": zoo.grid_rcnn_r50_fpn,
        "mask_scoring_rcnn_r50": zoo.mask_scoring_rcnn_r50_fpn,
        "double_head_rcnn_r50": zoo.double_head_rcnn_r50_fpn,
    }
    det_cfg, _ = builders[args.model]()
    partition = load_partition(args.partition) if args.partition else None

    if args.dataset == "cityscapes":
        from balancedgroupsoftmax_tpu.data.cityscapes import CityscapesDataset

        ds = CityscapesDataset(args.ann, args.img_prefix, test_mode=True)
    else:
        ds = LvisDataset(args.ann, args.img_prefix, test_mode=True)
    num_classes = len(ds.cat_ids) + 1
    if num_classes != det_cfg.bbox_head.num_classes:
        import dataclasses as _dc

        det_cfg = _dc.replace(
            det_cfg,
            bbox_head=_dc.replace(det_cfg.bbox_head, num_classes=num_classes),
        )
    if partition is not None:
        assert partition.num_classes == num_classes
    pcfg = PipelineConfig()
    if args.scale:
        import dataclasses as _dc

        pcfg = _dc.replace(pcfg, scale=(args.scale[0], args.scale[1]))
    # static pad buckets (square scales collapse the two into one)
    bucket_list = sorted(set(pcfg.buckets()))

    loaded = restore_checkpoint(args.checkpoint)
    params = loaded["params"] if "params" in loaded else loaded
    if args.tau is not None:
        params = tau_norm(params, args.tau)

    variables_back = None
    tail_mask_j = None
    if args.tau_select is not None:
        assert not (args.aug_rescore or args.flip_aug or args.aug_scales), (
            "--tau-select is a single-view path (the reference's dual-head "
            "test mode has no aug-test variant)"
        )
        import json as _json

        from balancedgroupsoftmax_tpu.models.dual_head import (
            tail_class_mask_from_counts,
        )

        params_back = tau_norm(params, args.tau_select, skip_bg=True)
        variables_back = {"params": params_back,
                          "batch_stats": loaded.get("batch_stats", {})}
        with open(args.ann) as f:
            cats = {c["id"]: c for c in _json.load(f)["categories"]}
        counts = np.zeros(num_classes, np.int64)
        for lbl, cid in enumerate(ds.cat_ids, start=1):
            counts[lbl] = int(cats[cid].get("instance_count", 0))
        tail_mask = tail_class_mask_from_counts(counts, args.tail_threshold)
        print(
            f"tau-select tau={args.tau_select}: {int(tail_mask.sum())}/"
            f"{num_classes - 1} tail classes (< {args.tail_threshold} instances)"
        )
        tail_mask_j = jnp.asarray(tail_mask)

    records = []
    import cv2

    n = min(len(ds), args.limit or len(ds))

    # two static buckets -> two compiled programs
    models = {}
    for bucket in bucket_list:
        import dataclasses

        cfg_b = dataclasses.replace(det_cfg, image_size=bucket)
        model = build_detector(cfg_b, partition=partition)
        if args.tau_select is not None:
            # dual-head scoring (simple_test_bboxes_reweight parity): one
            # shared proposal set, scores from both classifiers, per-RoI
            # tail-row override, single multiclass NMS
            from balancedgroupsoftmax_tpu.kernels import batched_multiclass_nms
            from balancedgroupsoftmax_tpu.models.detector import Detections
            from balancedgroupsoftmax_tpu.models.dual_head import (
                update_scores_with_reweight,
            )

            @jax.jit
            def _dual(v, vb, im, sh, sf, m=model, c=cfg_b, tail=tail_mask_j):
                pr = m.apply(v, im, sh, method="propose")
                bx, sc_main = m.apply(v, im, pr.boxes, sh, method="rescore")
                _, sc_back = m.apply(vb, im, pr.boxes, sh, method="rescore")
                sc = jax.vmap(
                    lambda a, b: update_scores_with_reweight(a, b, tail)
                )(sc_main, sc_back)
                bx = bx / sf[:, None, None]
                db, dsc, dl, dv = batched_multiclass_nms(
                    bx, sc, pr.valid,
                    c.rcnn_test.score_thr, c.rcnn_test.nms_iou_thr,
                    c.rcnn_test.max_per_img,
                    candidates_per_class=c.rcnn_test.nms_candidates_per_class,
                    nms_type=c.rcnn_test.nms_type,
                )
                return Detections(boxes=db, scores=dsc, labels=dl, valid=dv)

            fn = lambda v, im, sh, sf, _d=_dual: _d(
                v, variables_back, im, sh, sf
            )
        else:
            fn = jax.jit(
                lambda v, im, sh, sf, m=model: m.apply(v, im, sh, sf, method="predict")
            )
        mask_fn = fused_fn = None
        if det_cfg.mask_head is not None:
            mask_fn = jax.jit(
                lambda v, im, db, dl, sf, m=model: m.apply(
                    v, im, db, dl, sf, method="predict_masks"
                )
            )
            # single-pass serving: detections + masks from ONE backbone
            # evaluation (reference simple_test computes feats once,
            # two_stage.py:267-290). TTA paths must run the mask branch
            # on the post-merge boxes instead, so they keep mask_fn.
            if not (args.flip_aug or args.aug_scales or args.aug_rescore
                    or args.tau_select is not None):
                fused_fn = jax.jit(
                    lambda v, im, sh, sf, m=model: m.apply(
                        v, im, sh, sf, method="predict_with_masks"
                    )
                )
        models[bucket] = (fn, mask_fn, fused_fn)

    variables = {"params": params,
                 "batch_stats": loaded.get("batch_stats", {})}

    t0 = time.time()
    batch_buf = {b: [] for b in bucket_list}
    aug_models = {}  # (scale_mult, bucket) -> jitted predict

    def get_scale_model(mult, bucket):
        import dataclasses

        key = (mult, bucket)
        if key not in aug_models:
            cfg_b = dataclasses.replace(det_cfg, image_size=bucket)
            m = build_detector(cfg_b, partition=partition)
            aug_models[key] = jax.jit(
                lambda v, im, sh, sf, m=m: m.apply(v, im, sh, sf, method="predict")
            )
        return aug_models[key]

    from balancedgroupsoftmax_tpu.eval.aug import (
        flip_image_content as flip_content,
        unflip_boxes as unflip,
    )

    rescore_models = {}

    def get_rescore_fns(mult, bucket, flip):
        """Jitted (propose_mapped, rescore_mapped) for one view config.

        propose_mapped returns RPN proposals mapped back to the ORIGINAL
        image frame; rescore_mapped maps shared original-frame proposals
        into the view, re-scores them there, and maps the decoded
        per-class boxes back — so the host only ever concatenates and
        averages device arrays (aug_test_bboxes + merge_augs semantics)."""
        import dataclasses

        key = (mult, bucket, flip)
        if key not in rescore_models:
            from balancedgroupsoftmax_tpu.ops.boxes import bbox_flip

            cfg_b = dataclasses.replace(det_cfg, image_size=bucket)
            m = build_detector(cfg_b, partition=partition)

            def _flip(b, sh):
                return jax.vmap(bbox_flip)(b, sh)

            @jax.jit
            def propose_mapped(v, im, sh, sf):
                pr = m.apply(v, im, sh, method="propose")
                b = _flip(pr.boxes, sh) if flip else pr.boxes
                return b / sf[:, None, None], pr.scores, pr.valid

            @jax.jit
            def rescore_mapped(v, im, rois_orig, sh, sf):
                r = rois_orig * sf[:, None, None]
                if flip:
                    r = _flip(r, sh)
                bx, sc = m.apply(v, im, r, sh, method="rescore")
                if flip:
                    bx = _flip(bx, sh)
                return bx / sf[:, None, None], sc

            rescore_models[key] = (propose_mapped, rescore_mapped)
        return rescore_models[key]

    @jax.jit
    def _merge_props_fn(all_b, all_s, all_v):
        """(B, V*P, ...) original-frame proposals -> merged top-P
        (merge_aug_proposals: concat + NMS at rpn nms_thr)."""
        from balancedgroupsoftmax_tpu.ops.nms import nms

        pcfg_t = det_cfg.rpn_proposal_test
        return jax.vmap(
            lambda b, sc, v: nms(b, sc, v, pcfg_t.nms_thr, pcfg_t.max_num)
        )(all_b, all_s, all_v)

    @jax.jit
    def _final_nms_fn(boxes, scores, valid):
        from balancedgroupsoftmax_tpu.kernels import batched_multiclass_nms

        c = det_cfg
        return batched_multiclass_nms(
            boxes,
            scores,
            valid,
            c.rcnn_test.score_thr,
            c.rcnn_test.nms_iou_thr,
            c.rcnn_test.max_per_img,
            candidates_per_class=c.rcnn_test.nms_candidates_per_class,
            nms_type=c.rcnn_test.nms_type,
        )

    def run_aug_rescore(samples, raws, bucket):
        """The reference aug-test flow over this batch's views."""
        import dataclasses

        views = []  # (mult, bucket, flip, images, shapes, sfs) device arrays

        def add_view(mult, bkt, imgs_np, sh_np, sf_np):
            im = jnp.asarray(imgs_np)
            sh = jnp.asarray(sh_np)
            sf = jnp.asarray(sf_np)
            views.append((mult, bkt, False, im, sh, sf))
            if args.flip_aug:
                views.append(
                    (mult, bkt, True,
                     jnp.asarray(flip_content(imgs_np, sh_np)), sh, sf)
                )

        imgs_np = np.stack([s["image"] for s in samples])
        sh_np = np.stack([s["img_shape"] for s in samples])
        sf_np = np.stack([s["scale_factor"] for s in samples])
        add_view(1.0, bucket, imgs_np, sh_np, sf_np)
        for mult in args.aug_scales or []:
            pcfg_m = dataclasses.replace(
                pcfg,
                scale=(round(pcfg.scale[0] * mult), round(pcfg.scale[1] * mult)),
            )
            sm = [
                preprocess_image(
                    r, np.zeros((0, 4), np.float32), np.zeros(0, np.int32),
                    pcfg_m, False,
                )
                for r in raws
            ]
            add_view(
                mult, sm[0]["bucket"],
                np.stack([s["image"] for s in sm]),
                np.stack([s["img_shape"] for s in sm]),
                np.stack([s["scale_factor"] for s in sm]),
            )

        # 1) per-view proposals, mapped to the original frame
        parts = []
        for mult, bkt, fl, im, sh, sf in views:
            pf, _ = get_rescore_fns(mult, bkt, fl)
            parts.append(pf(variables, im, sh, sf))
        merged_b, _, merged_v = _merge_props_fn(
            jnp.concatenate([p[0] for p in parts], axis=1),
            jnp.concatenate([p[1] for p in parts], axis=1),
            jnp.concatenate([p[2] for p in parts], axis=1),
        )

        # 2) re-score the shared proposals on every view; average the
        # mapped-back per-class boxes and scores (merge_aug_bboxes)
        box_acc = scr_acc = None
        for mult, bkt, fl, im, sh, sf in views:
            _, rf = get_rescore_fns(mult, bkt, fl)
            bx, sc = rf(variables, im, merged_b, sh, sf)
            box_acc = bx if box_acc is None else box_acc + bx
            scr_acc = sc if scr_acc is None else scr_acc + sc
        nv = float(len(views))

        # 3) one multiclass NMS on the averages
        db, dsc, dl, dv = _final_nms_fn(box_acc / nv, scr_acc / nv, merged_v)
        return (
            np.asarray(db), np.asarray(dsc), np.asarray(dl), np.asarray(dv)
        )

    def flush(bucket):
        import dataclasses

        buf = batch_buf[bucket]
        if not buf:
            return
        pad = args.batch_size - len(buf)
        samples = [s for _, s, _ in buf] + [buf[-1][1]] * pad
        raws = [r for _, _, r in buf] + [buf[-1][2]] * pad
        images_np = np.stack([s["image"] for s in samples])
        shapes_np = np.stack([s["img_shape"] for s in samples])
        sfs_np = np.stack([s["scale_factor"] for s in samples])
        images = jnp.asarray(images_np)
        shapes = jnp.asarray(shapes_np)
        sfs = jnp.asarray(sfs_np)
        fn, mask_fn, fused_fn = models[bucket]
        mask_probs = mask_scores = None
        if args.aug_rescore:
            boxes, scores, labels, valid = run_aug_rescore(
                samples, raws, bucket
            )
        elif fused_fn is not None:
            out = fused_fn(variables, images, shapes, sfs)
            # MaskScoringRCNN returns (dets, masks, mask_scores) — the
            # segm records then carry det_score x predicted mask IoU
            # (maskiou_head.py get_mask_scores); other models return 2.
            dets, mprobs = out[0], out[1]
            mask_scores = np.asarray(out[2], np.float32) if len(out) > 2 else None
            mask_probs = np.asarray(mprobs, np.float32)  # bf16-safe for cv2
            boxes = np.array(dets.boxes)
            scores = np.array(dets.scores)
            labels = np.array(dets.labels)
            valid = np.array(dets.valid)
        else:
            dets = fn(variables, images, shapes, sfs)
            # np.array (copy): the zero-copy view is read-only and the TTA
            # merge below writes the merged detections back in place
            boxes = np.array(dets.boxes)
            scores = np.array(dets.scores)
            labels = np.array(dets.labels)
            valid = np.array(dets.valid)

        # ---- detection-level TTA passes (MultiScaleFlipAug equivalent);
        # --aug-rescore replaces this whole block with the shared-proposal
        # flow above. Every pass returns detections at ORIGINAL image
        # scale, so merging is a per-image concat + class-aware NMS;
        # flipped passes un-flip first.
        aug_sets = []  # list of per-pass (boxes, scores, labels, valid)

        def add_pass(b, s_, l_, v_, flipped, sh_np, sf_np):
            if flipped:
                b = np.stack(
                    [
                        unflip(b[bi], float(sh_np[bi][1]), float(sf_np[bi]))
                        for bi in range(len(b))
                    ]
                )
            aug_sets.append((b, np.asarray(s_), np.asarray(l_), np.asarray(v_)))

        if args.flip_aug and not args.aug_rescore:
            f = fn(
                variables,
                jnp.asarray(flip_content(images_np, shapes_np)),
                shapes,
                sfs,
            )
            add_pass(
                np.asarray(f.boxes), f.scores, f.labels, f.valid, True,
                shapes_np, sfs_np,
            )
        for mult in [] if args.aug_rescore else (args.aug_scales or []):
            pcfg_m = dataclasses.replace(
                pcfg,
                scale=(round(pcfg.scale[0] * mult), round(pcfg.scale[1] * mult)),
            )
            sm = [
                preprocess_image(
                    r, np.zeros((0, 4), np.float32), np.zeros(0, np.int32),
                    pcfg_m, False,
                )
                for r in raws
            ]
            # scaling preserves aspect, so one batch shares one bucket
            bkt = sm[0]["bucket"]
            fn_m = get_scale_model(mult, bkt)
            im_m_np = np.stack([s["image"] for s in sm])
            sh_m_np = np.stack([s["img_shape"] for s in sm])
            sf_m_np = np.stack([s["scale_factor"] for s in sm])
            im_m = jnp.asarray(im_m_np)
            sh_m = jnp.asarray(sh_m_np)
            sf_m = jnp.asarray(sf_m_np)
            d = fn_m(variables, im_m, sh_m, sf_m)
            add_pass(
                np.asarray(d.boxes), d.scores, d.labels, d.valid, False,
                sh_m_np, sf_m_np,
            )
            if args.flip_aug:
                d = fn_m(
                    variables,
                    jnp.asarray(flip_content(im_m_np, sh_m_np)),
                    sh_m,
                    sf_m,
                )
                add_pass(
                    np.asarray(d.boxes), d.scores, d.labels, d.valid, True,
                    sh_m_np, sf_m_np,
                )

        if aug_sets:
            from balancedgroupsoftmax_tpu.ops.nms import nms_keep as _nk

            for bi in range(len(buf)):
                boxes_m = np.concatenate([boxes[bi]] + [a[0][bi] for a in aug_sets])
                scores_m = np.concatenate([scores[bi]] + [a[1][bi] for a in aug_sets])
                labels_m = np.concatenate([labels[bi]] + [a[2][bi] for a in aug_sets])
                valid_m = np.concatenate([valid[bi]] + [a[3][bi] for a in aug_sets])
                # label-offset trick: one NMS call, suppression within class
                off = labels_m[:, None].astype(np.float64) * 1e5
                keep_mask = np.asarray(
                    _nk(jnp.asarray(boxes_m + off), jnp.asarray(scores_m),
                        jnp.asarray(valid_m), 0.5)
                )
                kept = np.where(keep_mask & valid_m)[0]
                kept = kept[np.argsort(-scores_m[kept], kind="stable")][:300]
                boxes[bi] = 0
                scores[bi] = 0
                labels[bi] = 0
                valid[bi] = False
                boxes[bi, : len(kept)] = boxes_m[kept]
                scores[bi, : len(kept)] = scores_m[kept]
                labels[bi, : len(kept)] = labels_m[kept]
                valid[bi, : len(kept)] = True

        # mask head runs on the FINAL (post-merge) boxes so pasted masks
        # match the reported detections (reference aug-test ordering:
        # bbox merge first, then the mask branch on merged boxes); the
        # single-pass serving path above already produced them
        if mask_probs is None and mask_fn is not None:
            mask_probs = np.asarray(
                mask_fn(variables, images, jnp.asarray(boxes),
                        jnp.asarray(labels), sfs),
                np.float32,  # bf16-safe for cv2
            )

        for bi, (idx, _, _) in enumerate(buf):
            recs = detections_to_records(
                ds.img_infos[idx]["id"], boxes[bi], scores[bi], labels[bi],
                valid[bi], ds.cat_ids,
            )
            if mask_probs is not None:
                # paste + RLE-encode each detection's mask at original size
                from balancedgroupsoftmax_tpu.ops.mask import paste_mask
                from balancedgroupsoftmax_tpu.utils.rle import encode_mask

                info = ds.img_infos[idx]
                vi = np.where(valid[bi])[0]
                for rec, di in zip(recs, vi):
                    full = paste_mask(
                        mask_probs[bi, di], boxes[bi, di],
                        info["height"], info["width"],
                    )
                    rec["segmentation"] = encode_mask(full)
                    if mask_scores is not None:
                        rec["segm_score"] = float(mask_scores[bi, di])
            records.extend(recs)
        batch_buf[bucket] = []

    # raw pixels are only needed by the TTA passes (re-preprocess at other
    # scales, unflip by original width); otherwise the native C++ pixel
    # path (decode+resize+normalize, GIL-released) skips them entirely
    need_raw = bool(args.flip_aug or args.aug_scales or args.aug_rescore)
    from balancedgroupsoftmax_tpu.data.pipeline import preprocess_image_file

    # multi-host: each process infers its rank-strided shard (single
    # process -> the full range), results are allgathered below
    from balancedgroupsoftmax_tpu.parallel.multihost import (
        gather_detection_records, host_shard,
    )

    for idx in host_shard(n):
        idx = int(idx)
        empty_b = np.zeros((0, 4), np.float32)
        empty_l = np.zeros(0, np.int32)
        if need_raw:
            raw = cv2.imread(ds.image_path(idx))
            if raw is None:
                raise ValueError(
                    f"cannot decode image file: {ds.image_path(idx)}"
                )
            img = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
            s = preprocess_image(img, empty_b, empty_l, pcfg, False)
        else:
            img = None
            s = preprocess_image_file(ds.image_path(idx), empty_b, empty_l, pcfg, False)
        bucket = s["bucket"]
        batch_buf[bucket].append((idx, s, img))
        if len(batch_buf[bucket]) == args.batch_size:
            flush(bucket)
        if (idx + 1) % 100 == 0:
            print(f"{idx + 1}/{n} images, {time.time() - t0:.1f}s", flush=True)
    for bucket in batch_buf:
        flush(bucket)

    print(f"inference done: {n} images in {time.time() - t0:.1f}s "
          f"({n / (time.time() - t0):.2f} img/s)")

    # multi-host: one allgather replaces the reference's tmpdir+pickle+
    # broadcast collect_results (test_lvis.py:64-103); process 0 writes/evals
    import jax as _jax

    if _jax.process_count() > 1:
        records = gather_detection_records(records)
        if _jax.process_index() != 0:
            return

    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f)
        print(f"wrote {len(records)} detections to {args.out}")

    if not args.no_eval:
        with open(args.ann) as f:
            gt = json.load(f)
        if args.limit:
            keep_ids = {ds.img_infos[i]["id"] for i in range(n)}
            gt["images"] = [i for i in gt["images"] if i["id"] in keep_ids]
            gt["annotations"] = [
                a for a in gt["annotations"] if a["image_id"] in keep_ids
            ]
        # COCO/Cityscapes-schema files carry no neg_category_ids — LVIS
        # federated filtering would delete every cross-class FP
        fed = args.dataset == "lvis"
        ev = LvisEvaluator(gt, records, federated=fed)
        ev.run()
        print("bbox results:")
        ev.print_results()
        if det_cfg.mask_head is not None and records and "segmentation" in records[0]:
            ev_m = LvisEvaluator(gt, records, iou_type="segm", federated=fed)
            ev_m.run()
            print("segm results:")
            ev_m.print_results()


if __name__ == "__main__":
    main()

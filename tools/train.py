#!/usr/bin/env python
"""Training CLI — the tools/train.py of this framework.

Parity: /root/reference/tools/train.py + mmdet/apis/train.py, redesigned:
no Runner/hook system — one jitted data-parallel train step in a plain
epoch loop with logging, checkpointing, linear-scaling LR and the
two-phase BAGS recipe (--selectp 1 --load-from baseline_ckpt).

Usage:
  python tools/train.py --model gs_faster_rcnn_r50 \
      --ann data/lvis/lvis_v0.5_train.json --img-prefix data/lvis/train2017 \
      --partition data/lvis/gs_partition.npz --work-dir work_dirs/bags \
      --load-from work_dirs/baseline/ckpt_epoch_12 --selectp 1
"""

import argparse
import dataclasses
import json
import os
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
    p.add_argument("--partition", default=None, help=".npz from tools/gs_partition.py")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--load-from", default=None, help="warm start checkpoint (non-strict)")
    p.add_argument("--resume-from", default=None)
    p.add_argument("--pretrained-backbone", default=None, help="torchvision resnet .pth")
    p.add_argument("--selectp", type=int, default=None,
                   help="0 all, 1 fc_cls only, 2 bbox head (tools/train.py:143)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None, help="global batch")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr-steps", type=int, nargs="*", default=None,
                   help="epochs at which LR decays x0.1 (default 8 11)")
    p.add_argument("--warmup-iters", type=int, default=None,
                   help="linear warmup length in iterations (default 500; "
                        "shorten for small synthetic runs where 500 iters "
                        "would span most of the schedule)")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="linear scaling rule lr *= batch/16 (train.py:107)")
    p.add_argument("--use-rfs", action="store_true", help="repeat factor sampling")
    p.add_argument("--rfs-t", type=float, default=0.001,
                   help="RFS frequency threshold t in max(1, sqrt(t/f_c)) "
                        "(loader/sampler.py:104-117; 0.001 is the LVIS "
                        "default). On small fixtures t must be raised to "
                        "~several/num_images or every factor rounds to 1 "
                        "and RFS silently becomes a no-op")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone blocks (jax.checkpoint): "
                        "fits larger per-chip batches at ~15-20%% extra "
                        "compute")
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32",
                   help="compute dtype (params stay f32; bfloat16 = the "
                        "TPU-native analogue of the reference's fp16 hook, "
                        "core/fp16/hooks.py, minus the loss scaling bf16 "
                        "does not need)")
    p.add_argument("--scale", type=int, nargs=2, default=None,
                   metavar=("LONG", "SHORT"),
                   help="keep-ratio resize target (default 1333 800, the "
                        "reference Resize img_scale); smaller scales make "
                        "synthetic-data experiments cheap")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--save-interval", type=int, default=1,
                   help="checkpoint every N epochs (checkpoint_config interval)")
    p.add_argument("--autosave-steps", type=int, default=0,
                   help="also checkpoint every N steps to <work_dir>/autosave "
                        "(preemption recovery; resume with --resume-from)")
    p.add_argument("--max-steps", type=int, default=None, help="debug cap")
    p.add_argument("--val-ann", default=None,
                   help="val annotation json: evaluate after each epoch "
                        "(DistEvalHook equivalent)")
    p.add_argument("--val-img-prefix", default=None)
    p.add_argument("--val-limit", type=int, default=None)
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize; the batcher "
                        "shards batches by process, the jitted step reduces "
                        "gradients over the global mesh")
    return p.parse_args()


def main():
    args = parse_args()
    from balancedgroupsoftmax_tpu import enable_compilation_cache

    enable_compilation_cache()
    if args.distributed:
        from balancedgroupsoftmax_tpu.parallel.multihost import init_distributed

        init_distributed()
    os.makedirs(args.work_dir, exist_ok=True)

    from balancedgroupsoftmax_tpu import zoo
    from balancedgroupsoftmax_tpu.data.lvis import LvisDataset
    from balancedgroupsoftmax_tpu.data.pipeline import (
        DetBatcher, PipelineConfig, collate, preprocess_image, repeat_factors,
    )
    from balancedgroupsoftmax_tpu.gs.partition import load_partition
    from balancedgroupsoftmax_tpu.models.detector import build_model as build_detector
    from balancedgroupsoftmax_tpu.parallel.optim import make_optimizer
    from balancedgroupsoftmax_tpu.parallel.train import (
        create_train_state, make_mesh, make_train_step, shard_batch, shard_train_step,
    )
    from balancedgroupsoftmax_tpu.utils.checkpoint import (
        load_torchvision_resnet, restore_checkpoint, save_checkpoint, warm_start,
    )

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
    det_cfg, train_cfg = builders[args.model]()
    if args.remat:
        det_cfg = dataclasses.replace(
            det_cfg,
            backbone=dataclasses.replace(det_cfg.backbone, remat=True),
        )
    if args.selectp is not None:
        train_cfg = dataclasses.replace(train_cfg, selectp=args.selectp)
    if train_cfg.selectp != 0 and not (args.load_from or args.resume_from):
        # the gs_* zoo entries default to the reference's PHASE-2 recipe
        # (selectp=1: only fc_cls trains, tools/train.py:49-57 upstream) —
        # from scratch that freezes the backbone/RPN and nothing learns
        print(
            f"WARNING: selectp={train_cfg.selectp} trains only the "
            "classifier subset (the BAGS phase-2 recipe) but no warm-start "
            "checkpoint was given (--load-from). For full from-scratch "
            "training pass --selectp 0."
        )
    if args.epochs is not None:
        train_cfg = dataclasses.replace(train_cfg, total_epochs=args.epochs)
    if args.warmup_iters is not None:
        train_cfg = dataclasses.replace(train_cfg, warmup_iters=args.warmup_iters)
    if args.lr_steps is not None:
        train_cfg = dataclasses.replace(
            train_cfg, lr_step_epochs=tuple(args.lr_steps)
        )

    n_dev = jax.device_count()
    batch_size = args.batch_size or 2 * n_dev  # 2 imgs/device (bg8.py data)
    lr = args.lr if args.lr is not None else train_cfg.lr
    if args.autoscale_lr:
        lr = lr * batch_size / 16.0
    train_cfg = dataclasses.replace(train_cfg, lr=lr)

    print(f"loading dataset {args.ann}")
    if args.dataset == "cityscapes":
        from balancedgroupsoftmax_tpu.data.cityscapes import CityscapesDataset

        ds = CityscapesDataset(args.ann, args.img_prefix)
    else:
        ds = LvisDataset(args.ann, args.img_prefix)
    num_classes = len(ds.cat_ids) + 1
    if num_classes != det_cfg.bbox_head.num_classes:
        det_cfg = dataclasses.replace(
            det_cfg,
            bbox_head=dataclasses.replace(det_cfg.bbox_head, num_classes=num_classes),
        )
        print(f"model resized to dataset: {num_classes} classes (incl. bg)")
    partition = load_partition(args.partition) if args.partition else None
    if partition is not None:
        assert partition.num_classes == num_classes, (
            f"partition has {partition.num_classes} classes, dataset {num_classes}"
        )
    pcfg = PipelineConfig(max_gt_boxes=det_cfg.max_gt_boxes)
    if args.scale:
        pcfg = dataclasses.replace(pcfg, scale=(args.scale[0], args.scale[1]))
        # image_size only sizes the init dummy input now (anchors follow
        # the traced batch shape per bucket); keep it consistent anyway
        det_cfg = dataclasses.replace(det_cfg, image_size=pcfg.buckets()[0])
    model = build_detector(
        det_cfg, partition=partition, dtype=jnp.dtype(args.dtype)
    )
    steps_per_epoch = max(len(ds) // batch_size, 1)

    h, w = det_cfg.image_size
    variables = model.init(jax.random.PRNGKey(args.seed), jnp.zeros((1, h, w, 3)))

    if args.pretrained_backbone:
        bb_params, bb_stats = load_torchvision_resnet(
            args.pretrained_backbone, det_cfg.backbone.depth
        )
        params, copied, _ = warm_start(
            variables["params"]["backbone"], bb_params
        )
        variables["params"]["backbone"] = params
        variables["batch_stats"]["backbone"] = jax.tree_util.tree_map(
            np.asarray, bb_stats
        )
        print(f"backbone warm start: {len(copied)} tensors")

    if args.load_from:
        loaded = restore_checkpoint(args.load_from)
        params, copied, skipped = warm_start(
            variables["params"], loaded.get("params", loaded)
        )
        variables = {**variables, "params": params}
        print(f"warm start from {args.load_from}: copied {len(copied)}, "
              f"fresh {len(skipped)} (shape-mismatched fc_cls stays fresh)")
        if "batch_stats" in loaded:
            variables["batch_stats"] = loaded["batch_stats"]

    tx = make_optimizer(train_cfg, variables["params"], steps_per_epoch,
                        det_cfg.backbone.frozen_stages)
    state = create_train_state(variables, tx)

    def full_state_dict(st):
        # full resume payload: params + frozen BN stats + optimizer state
        # (SGD momentum) + step — the runner.resume parity the reference has
        # (/root/reference/mmdet/apis/train.py:201-204)
        return dict(
            params=st.params, batch_stats=st.batch_stats,
            opt_state=st.opt_state, step=np.asarray(int(st.step)),
        )

    start_epoch = 0
    if args.resume_from:
        # restore against the live state as target so optax's named-tuple
        # opt_state structure round-trips; older checkpoints without
        # opt_state fall back to params-only (momentum restarts)
        try:
            loaded = restore_checkpoint(
                args.resume_from, jax.device_get(full_state_dict(state))
            )
            opt_state = loaded["opt_state"]
            note = "with optimizer state"
        except Exception:
            loaded = restore_checkpoint(args.resume_from)
            opt_state = state.opt_state
            note = "params only (no opt_state in checkpoint; momentum restarts)"
        state = state.replace(
            params=loaded["params"],
            batch_stats=loaded.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            step=jnp.asarray(int(loaded["step"]), jnp.int32),
        )
        start_epoch = int(loaded["step"]) // steps_per_epoch
        print(f"resumed from {args.resume_from} at step {int(loaded['step'])} "
              f"({note})")

    # mesh size = largest divisor of the global batch that fits the devices
    n_mesh = jax.device_count()
    while batch_size % n_mesh:
        n_mesh -= 1
    mesh = make_mesh(n_mesh)
    if n_mesh != jax.device_count():
        print(f"using {n_mesh}/{jax.device_count()} devices (batch {batch_size})")
    # the trainable mask both masks the optimizer AND elides the frozen
    # subtrees' backward (requires_grad=False parity, apis/train.py:100)
    from balancedgroupsoftmax_tpu.parallel.optim import trainable_mask

    mask = trainable_mask(
        state.params, train_cfg.selectp, det_cfg.backbone.frozen_stages
    )
    step_fn = shard_train_step(make_train_step(model, tx, trainable=mask), mesh)
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )

    # aspect-bucket flags + optional RFS
    print("computing bucket flags")
    flags = np.array(
        [0 if i["width"] >= i["height"] else 1 for i in ds.img_infos], np.int64
    )
    repeat = None
    if args.use_rfs:
        labels_per_img = [ds.get_ann_info(i)["labels"] for i in range(len(ds))]
        repeat = repeat_factors(labels_per_img, len(ds.cat_ids), t=args.rfs_t)
        n_up = int((repeat > 1.0).sum())
        print(
            f"RFS t={args.rfs_t}: {n_up}/{len(repeat)} images upsampled, "
            f"max factor {repeat.max():.3f}, "
            f"expected epoch length {repeat.sum():.1f} vs {len(repeat)}"
        )
        if n_up == 0:
            raise SystemExit(
                "--use-rfs is a no-op: every repeat factor is 1 because "
                f"t={args.rfs_t} is below the rarest class frequency "
                "(f_c = images-with-class / num_images). Raise --rfs-t "
                "(rule of thumb: ~8/num_images on small fixtures) or drop "
                "--use-rfs; refusing to train a sampler that cannot sample."
            )
    import jax as _jax

    # each host batches its shard of the epoch permutation; the per-host
    # batch is the global batch divided across processes (single process:
    # the identity)
    assert batch_size % _jax.process_count() == 0, (
        f"process count {_jax.process_count()} must divide global batch {batch_size}"
    )
    batcher = DetBatcher(
        flags, batch_size // _jax.process_count(), seed=args.seed, repeat=repeat,
        shard_id=_jax.process_index(), num_shards=_jax.process_count(),
    )

    from balancedgroupsoftmax_tpu.data.pipeline import preprocess_image_file

    with_masks = det_cfg.mask_head is not None

    def load_sample(idx, rng):
        info = ds.img_infos[idx]
        ann = ds.get_ann_info(idx)
        # native C++ decode+resize+normalize (GIL-released); cv2 fallback
        s = preprocess_image_file(
            ds.image_path(idx), ann["bboxes"], ann["labels"], pcfg, True, rng
        )
        if with_masks:
            from balancedgroupsoftmax_tpu.ops.mask import rasterize_gt_masks

            crops = rasterize_gt_masks(
                ann["masks"], ann["bboxes"], info["height"], info["width"],
                capacity=pcfg.max_gt_boxes,
            )
            if s["flipped"]:
                crops = crops[:, :, ::-1].copy()
            s["gt_mask_crops"] = crops
        return s

    key = jax.random.PRNGKey(args.seed)
    rng = np.random.RandomState(args.seed)
    global_step = int(jax.device_get(state.step))
    t_log = time.time()
    log_path = os.path.join(args.work_dir, "train_log.jsonl")

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=4)

    def make_batch(batch_idx, epoch):
        # per-sample deterministic rngs: thread-safe and epoch-varying
        samples = pool.map(
            lambda i: load_sample(
                i, np.random.RandomState((args.seed * 1000003 + epoch * 131 + int(i)) % (2**31))
            ),
            batch_idx,
        )
        samples = list(samples)
        batch = collate(samples)
        if with_masks:
            batch["gt_mask_crops"] = np.stack(
                [s["gt_mask_crops"] for s in samples]
            )
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k != "scale_factors"}
        return shard_batch(batch, mesh)

    for epoch in range(start_epoch, train_cfg.total_epochs):
        batches = batcher.epoch_batches(epoch)
        # one-batch lookahead: prepare batch t+1 while the device runs t
        pending = pool.submit(make_batch, batches[0], epoch) if batches else None
        for bi in range(len(batches)):
            batch = pending.result()
            pending = (
                pool.submit(make_batch, batches[bi + 1], epoch)
                if bi + 1 < len(batches)
                else None
            )
            state, metrics = step_fn(state, batch, key)
            global_step += 1
            if args.autosave_steps and global_step % args.autosave_steps == 0:
                # async: staged to host here, written by a background
                # thread while training continues (orbax commits the dir
                # atomically, so a preemption mid-write can't corrupt it)
                save_checkpoint(
                    os.path.join(args.work_dir, "autosave"),
                    jax.device_get(full_state_dict(state)),
                    block=False,
                )
            if global_step % args.log_interval == 0:
                m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                dt = (time.time() - t_log) / args.log_interval
                t_log = time.time()
                line = dict(epoch=epoch, step=global_step,
                            imgs_per_sec=batch_size / dt, **m)
                print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                                  for k, v in line.items()}))
                with open(log_path, "a") as f:
                    f.write(json.dumps(line) + "\n")
            if args.max_steps and global_step >= args.max_steps:
                break
        if (epoch + 1) % args.save_interval and epoch + 1 != train_cfg.total_epochs:
            if args.max_steps and global_step >= args.max_steps:
                pass  # fall through to save the final state below
            else:
                continue
        ckpt = os.path.join(args.work_dir, f"ckpt_epoch_{epoch + 1}")
        save_checkpoint(ckpt, jax.device_get(full_state_dict(state)), block=False)
        # sidecar meta, the analogue of the config text / class names the
        # reference embeds in checkpoints (/root/reference/tools/train.py:133-139)
        with open(ckpt + ".meta.json", "w") as f:
            json.dump(
                dict(
                    model=args.model,
                    epoch=epoch + 1,
                    step=global_step,
                    classes=list(ds.class_names),
                    train_cfg=dataclasses.asdict(train_cfg),
                    argv=sys.argv[1:],
                ),
                f, indent=1, default=str,
            )
        print(f"saved {ckpt}")
        if args.val_ann:
            from balancedgroupsoftmax_tpu.utils.checkpoint import wait_for_checkpoints

            wait_for_checkpoints()  # eval subprocess reads this checkpoint
            # epoch-end evaluation (DistEvalHook equivalent): run the eval
            # CLI on the fresh checkpoint
            import subprocess

            cmd = [
                sys.executable, "tools/test_lvis.py",
                "--model", args.model, "--ann", args.val_ann,
                "--img-prefix", args.val_img_prefix or args.img_prefix,
                "--checkpoint", ckpt,
            ]
            if args.partition:
                cmd += ["--partition", args.partition]
            if args.val_limit:
                cmd += ["--limit", str(args.val_limit)]
            if args.scale:
                cmd += ["--scale", str(args.scale[0]), str(args.scale[1])]
            if args.dataset != "lvis":
                cmd += ["--dataset", args.dataset]
            print(f"[epoch {epoch + 1}] validation:")
            subprocess.run(cmd, check=False)
        if args.max_steps and global_step >= args.max_steps:
            break

    from balancedgroupsoftmax_tpu.utils.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()  # join in-flight async writes before exiting


if __name__ == "__main__":
    main()

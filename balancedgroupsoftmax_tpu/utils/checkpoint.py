"""Checkpointing: orbax save/resume + torch weight conversion + warm start.

Parity notes:
- The reference warm-starts BAGS training from the baseline checkpoint with
  a non-strict load: the resized fc_cls (1231 -> 1236 logits) stays freshly
  initialized (configs/bags/*.py `load_from`, mmcv non-strict
  load_checkpoint; SURVEY.md §5 checkpoint/resume). `warm_start` reproduces
  exactly that: copy every leaf whose path+shape matches, keep the fresh
  init elsewhere, and report both lists.
- `convert_torchvision_resnet` maps torchvision resnet50/101 state_dicts
  (the reference's pretrained='torchvision://resnet50', bg8.py:4) onto our
  flax ResNet: conv OIHW -> HWIO, BN running stats -> batch_stats.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import numpy as np


# --------------------------------------------------------------------------
# orbax save / restore
# --------------------------------------------------------------------------
_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(path: str, state: Any, overwrite: bool = True, block: bool = True) -> None:
    """Save a pytree checkpoint via orbax.

    block=False returns as soon as the state is staged to host memory and
    writes to disk in a background thread (orbax AsyncCheckpointer) — the
    train loop keeps stepping during the write (the preemption-autosave
    path). A later save or `wait_for_checkpoints()` joins the write;
    orbax only commits the directory atomically on success, so a kill
    mid-write never leaves a checkpoint that restores partially.
    """
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _async_checkpointer()
    # 0-d python/numpy scalars are not supported by orbax: lift to arrays.
    # For async saves np.array (copy) snapshots host arrays too — np.asarray
    # would alias them and later in-place mutation (the next train step's
    # donated buffers) could leak into the background write.
    snap = np.array if not block else np.asarray
    state = jax.tree_util.tree_map(snap, state)
    ckptr.save(path, args=ocp.args.StandardSave(state), force=overwrite)
    if block:
        ckptr.wait_until_finished()


def wait_for_checkpoints() -> None:
    """Join any in-flight async checkpoint writes (call before exit)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def restore_checkpoint(path: str, target: Any = None) -> Any:
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    target = jax.tree_util.tree_map(np.asarray, target)
    return ckptr.restore(path, target)


# --------------------------------------------------------------------------
# warm start (non-strict load, mmcv parity)
# --------------------------------------------------------------------------
def warm_start(init_params: Any, loaded_params: Any) -> Tuple[Any, List[str], List[str]]:
    """Copy every leaf with matching path+shape from loaded into init.

    Returns (params, copied_paths, skipped_paths). Shape-mismatched or
    missing leaves keep their fresh initialization — the mechanism that
    lets the widened GS fc_cls start fresh while everything else warm-starts.
    """
    import jax

    copied: List[str] = []
    skipped: List[str] = []

    flat_loaded = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(loaded_params)
    }

    def merge(path, init_leaf):
        name = jax.tree_util.keystr(path)
        if name in flat_loaded and tuple(flat_loaded[name].shape) == tuple(
            init_leaf.shape
        ):
            copied.append(name)
            return np.asarray(flat_loaded[name], dtype=np.asarray(init_leaf).dtype)
        skipped.append(name)
        return init_leaf

    out = jax.tree_util.tree_map_with_path(merge, init_params)
    return out, copied, skipped


# --------------------------------------------------------------------------
# torchvision -> flax ResNet conversion
# --------------------------------------------------------------------------
def _conv(w) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_torchvision_resnet(state_dict: Dict[str, Any], depth: int = 50):
    """torchvision resnet state_dict -> (params, batch_stats) for models.resnet.

    Accepts tensors or numpy arrays (call .numpy() upstream for torch).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items() if "num_batches" not in k}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def bn(dst, src):
        put(params, dst + ("scale",), sd[src + ".weight"])
        put(params, dst + ("bias",), sd[src + ".bias"])
        put(stats, dst + ("mean",), sd[src + ".running_mean"])
        put(stats, dst + ("var",), sd[src + ".running_var"])

    put(params, ("conv1", "kernel"), _conv(sd["conv1.weight"]))
    bn(("bn1",), "bn1")

    from ..models.resnet import ARCH_SETTINGS

    blocks = ARCH_SETTINGS[depth]
    for stage, num_blocks in enumerate(blocks):
        for b in range(num_blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_block{b}"
            for i in (1, 2, 3):
                put(
                    params,
                    (dst, f"conv{i}", "kernel"),
                    _conv(sd[f"{src}.conv{i}.weight"]),
                )
                bn((dst, f"bn{i}"), f"{src}.bn{i}")
            if f"{src}.downsample.0.weight" in sd:
                put(
                    params,
                    (dst, "downsample_conv", "kernel"),
                    _conv(sd[f"{src}.downsample.0.weight"]),
                )
                bn((dst, "downsample_bn"), f"{src}.downsample.1")
    return params, stats


def load_torchvision_resnet(path: str, depth: int = 50):
    """Load a torchvision resnet .pth and convert (torch cpu required)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_torchvision_resnet(sd, depth)


# --------------------------------------------------------------------------
# mmdet checkpoint conversion (full detector, for parity verification)
# --------------------------------------------------------------------------
def _fc_from_torch(w: np.ndarray, roi: int = None, channels: int = None) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out); when the input
    is flattened RoI features, reorder from torch's (C, H, W) flattening to
    our (H, W, C)."""
    w = np.asarray(w)
    if roi is not None:
        out_dim, in_dim = w.shape
        w = w.reshape(out_dim, channels, roi, roi)  # (O, C, H, W)
        w = np.transpose(w, (0, 2, 3, 1)).reshape(out_dim, in_dim)  # -> (O, HWC)
    return w.T


def _convert_bbox_head(sd: Dict[str, Any], prefix: str, roi_size: int, roi_channels: int):
    head: Dict[str, Any] = {}
    j = 0
    while f"{prefix}.shared_fcs.{j}.weight" in sd:
        head[f"shared_fc{j}"] = dict(
            kernel=_fc_from_torch(
                sd[f"{prefix}.shared_fcs.{j}.weight"],
                roi=roi_size if j == 0 else None,
                channels=roi_channels,
            ),
            bias=sd[f"{prefix}.shared_fcs.{j}.bias"],
        )
        j += 1
    for name in ("fc_cls", "fc_reg"):
        head[name] = dict(
            kernel=_fc_from_torch(sd[f"{prefix}.{name}.weight"]),
            bias=sd[f"{prefix}.{name}.bias"],
        )
    return head


def _convert_mask_head(sd: Dict[str, Any], prefix: str):
    """FCNMaskHead: convs.{i}.conv -> conv{i}, upsample (ConvTranspose),
    conv_logits; conv_res for HTC info flow."""
    head: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.convs.{i}.conv.weight" in sd:
        head[f"conv{i}"] = dict(
            kernel=_conv(sd[f"{prefix}.convs.{i}.conv.weight"]),
            bias=sd[f"{prefix}.convs.{i}.conv.bias"],
        )
        i += 1
    if f"{prefix}.upsample.weight" in sd:
        # torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in,
        # out) with a spatial flip: torch computes the gradient-of-conv
        # (implicit kernel flip), flax.ConvTranspose does not (verified
        # numerically against F.conv_transpose2d).
        w = np.asarray(sd[f"{prefix}.upsample.weight"])
        head["upsample"] = dict(
            kernel=np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy(),
            bias=sd[f"{prefix}.upsample.bias"],
        )
    if f"{prefix}.conv_logits.weight" in sd:
        head["conv_logits"] = dict(
            kernel=_conv(sd[f"{prefix}.conv_logits.weight"]),
            bias=sd[f"{prefix}.conv_logits.bias"],
        )
    if f"{prefix}.conv_res.conv.weight" in sd:
        head["conv_res"] = dict(
            kernel=_conv(sd[f"{prefix}.conv_res.conv.weight"]),
            bias=sd[f"{prefix}.conv_res.conv.bias"],
        )
    return head


def convert_mmdet_faster_rcnn(
    state_dict: Dict[str, Any],
    depth: int = 50,
    roi_size: int = 7,
    roi_channels: int = 256,
):
    """mmdet v1 two-stage checkpoint -> our (params, batch_stats).

    Handles Faster/Mask R-CNN and GS variants, cascade stages
    (bbox_head.{i} -> bbox_head_{i}, mask_head.{i} -> mask_head_{i}) and
    the HTC semantic head. Name map: backbone.* -> backbone/*,
    neck.lateral_convs.{i}.conv -> neck/lateral{i}, neck.fpn_convs.{i}.conv
    -> neck/fpn{i}, rpn_head.* -> rpn_head/*, bbox_head.shared_fcs.{i} ->
    bbox_head/shared_fc{i}, bbox_head.fc_cls/fc_reg -> bbox_head/fc_cls|reg.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items() if "num_batches" not in k}
    bb = {k[len("backbone.") :]: v for k, v in sd.items() if k.startswith("backbone.")}
    params, stats = convert_torchvision_resnet(bb, depth)
    params = {"backbone": params}
    stats = {"backbone": stats}

    neck: Dict[str, Any] = {}
    i = 0
    while f"neck.lateral_convs.{i}.conv.weight" in sd:
        neck[f"lateral{i}"] = dict(
            kernel=_conv(sd[f"neck.lateral_convs.{i}.conv.weight"]),
            bias=sd[f"neck.lateral_convs.{i}.conv.bias"],
        )
        neck[f"fpn{i}"] = dict(
            kernel=_conv(sd[f"neck.fpn_convs.{i}.conv.weight"]),
            bias=sd[f"neck.fpn_convs.{i}.conv.bias"],
        )
        i += 1
    params["neck"] = neck

    params["rpn_head"] = dict(
        rpn_conv=dict(kernel=_conv(sd["rpn_head.rpn_conv.weight"]), bias=sd["rpn_head.rpn_conv.bias"]),
        rpn_cls=dict(kernel=_conv(sd["rpn_head.rpn_cls.weight"]), bias=sd["rpn_head.rpn_cls.bias"]),
        rpn_reg=dict(kernel=_conv(sd["rpn_head.rpn_reg.weight"]), bias=sd["rpn_head.rpn_reg.bias"]),
    )

    # bbox head(s): plain (bbox_head.*) or cascade stages (bbox_head.{i}.*)
    if "bbox_head.fc_cls.weight" in sd:
        params["bbox_head"] = _convert_bbox_head(sd, "bbox_head", roi_size, roi_channels)
    else:
        i = 0
        while f"bbox_head.{i}.fc_cls.weight" in sd:
            params[f"bbox_head_{i}"] = _convert_bbox_head(
                sd, f"bbox_head.{i}", roi_size, roi_channels
            )
            i += 1

    # mask head(s)
    if "mask_head.conv_logits.weight" in sd:
        params["mask_head"] = _convert_mask_head(sd, "mask_head")
    else:
        i = 0
        while f"mask_head.{i}.conv_logits.weight" in sd:
            params[f"mask_head_{i}"] = _convert_mask_head(sd, f"mask_head.{i}")
            i += 1

    # HTC semantic head
    if "semantic_head.conv_logits.weight" in sd:
        sem: Dict[str, Any] = {}
        i = 0
        while f"semantic_head.lateral_convs.{i}.conv.weight" in sd:
            sem[f"lateral{i}"] = dict(
                kernel=_conv(sd[f"semantic_head.lateral_convs.{i}.conv.weight"]),
                bias=sd[f"semantic_head.lateral_convs.{i}.conv.bias"],
            )
            i += 1
        i = 0
        while f"semantic_head.convs.{i}.conv.weight" in sd:
            sem[f"conv{i}"] = dict(
                kernel=_conv(sd[f"semantic_head.convs.{i}.conv.weight"]),
                bias=sd[f"semantic_head.convs.{i}.conv.bias"],
            )
            i += 1
        sem["conv_embedding"] = dict(
            kernel=_conv(sd["semantic_head.conv_embedding.conv.weight"]),
            bias=sd["semantic_head.conv_embedding.conv.bias"],
        )
        sem["conv_logits"] = dict(
            kernel=_conv(sd["semantic_head.conv_logits.weight"]),
            bias=sd["semantic_head.conv_logits.bias"],
        )
        params["semantic_head"] = sem
    return params, stats

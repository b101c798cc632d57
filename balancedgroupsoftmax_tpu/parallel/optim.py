"""Optimizer: SGD recipe + parameter freezing masks.

Parity: the reference trains with SGD(lr=0.01, momentum=0.9, wd=1e-4),
grad_clip(max_norm=35), 500-iter linear warmup from lr/3 and x0.1 step decay
at epochs [8, 11] (configs/bags/gs_faster_rcnn_r50_fpn_1x_lvis_with0_bg8.py:
170-178). Parameter selection (`selectp`, tools/train.py:49-91,143-158) and
backbone stage freezing (resnet.py:483-494) are expressed as a boolean
parameter mask: frozen parameters get zero gradient, no weight decay, and
are excluded from the global-norm clip — exactly requires_grad=False
semantics (the reference optimizer filters on requires_grad,
apis/train.py:100).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int) -> Callable:
    """Linear warmup (warmup_ratio -> 1) then step decay at lr_step_epochs."""
    boundaries = {e * steps_per_epoch: 0.1 for e in cfg.lr_step_epochs}

    def schedule(step):
        warm = cfg.warmup_ratio + (1.0 - cfg.warmup_ratio) * jnp.minimum(
            step / cfg.warmup_iters, 1.0
        )
        decay = jnp.ones(())
        for b in sorted(boundaries):
            decay = decay * jnp.where(step >= b, boundaries[b], 1.0)
        return cfg.lr * warm * decay

    return schedule


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def trainable_mask(params: Any, selectp: int = 0, frozen_stages: int = 1) -> Any:
    """Boolean pytree: True = parameter trains.

    selectp (tools/train.py:143-158): 0 = everything except frozen backbone
    stages; 1 = only fc_cls; 2 = whole bbox head; 3 = every cascade stage's
    fc_cls; 4 = bbox + mask heads.
    """

    def decide(path, _):
        name = _path_str(path)
        if selectp == 1:
            return "fc_cls" in name
        if selectp == 2:
            return name.startswith("bbox_head")
        if selectp == 3:
            return "fc_cls" in name  # cascade heads are bbox_head_{i}/fc_cls
        if selectp == 4:
            return name.startswith("bbox_head") or name.startswith("mask_head")
        # selectp == 0: freeze conv1/bn1 + layer1..layer{frozen_stages}
        if name.startswith("backbone"):
            if frozen_stages >= 0 and ("conv1" in name.split("/")[1] or name.split("/")[1] == "bn1"):
                return False
            for s in range(1, frozen_stages + 1):
                if name.split("/")[1].startswith(f"layer{s}_"):
                    return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def _zero_frozen(mask):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        new = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask
        )
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    cfg: TrainConfig, params: Any, steps_per_epoch: int = 1, frozen_stages: int = 1
) -> optax.GradientTransformation:
    mask = trainable_mask(params, cfg.selectp, frozen_stages)
    return optax.chain(
        _zero_frozen(mask),
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.add_decayed_weights(cfg.weight_decay, mask=mask),
        optax.sgd(lr_schedule(cfg, steps_per_epoch), momentum=cfg.momentum),
    )

"""Grouped-softmax (BAGS) loss and score merging as fused jnp functions.

Parity: /root/reference/mmdet/models/bbox_heads/gs_bbox_head_with0.py —
`_remap_labels` (:91-112), `_sample_others` (:63-89), `_slice_preds`
(:134-145), `loss` (:147-186) and `_merge_score` (:239-273).

TPU-native design: the reference's per-bin python loop with host-side
np.random background sampling becomes one pass of static slicing (bin sizes
are compile-time constants), a `label2binlabel` gather for label remapping,
`jax.random` rank-based background subsampling, and — at inference — a
single `label2logit` gather that replaces the per-bin scatter of
`fg_merge[:, split] = ...`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.losses import softmax_cross_entropy
from .partition import GSPartition


def _bin_slices(logits: jnp.ndarray, partition: GSPartition):
    """Static per-bin views of the (N, L) logit matrix."""
    out = []
    start = 0
    for size in partition.bin_sizes:
        out.append(logits[:, start : start + size])
        start += size
    return out


def gs_loss(
    key: jax.Array,
    cls_logits: jnp.ndarray,  # (N, L) with L = num_classes + num_bins
    labels: jnp.ndarray,  # (N,) int32 global labels (0 = background)
    roi_valid: jnp.ndarray,  # (N,) bool — padded RoI slots get zero weight
    partition: GSPartition,
    others_sample_ratio: float = 8.0,
    class_weights: jnp.ndarray | None = None,  # (C,) — GS-reweight variant
) -> Dict[str, jnp.ndarray]:
    """Per-bin cross-entropy losses {'loss_cls_bin{i}': scalar}.

    Bin 0 ({bg, fg}) weights every valid RoI. Bins 1..B-1 weight their own
    foreground RoIs plus `ratio x fg_count` randomly sampled "others" RoIs
    (all RoIs whose within-bin label is 0); if a bin has no foreground in
    the batch its loss is zero (reference `_sample_others` returns zeros,
    gs_bbox_head_with0.py:71-72); if the sample budget exceeds the available
    others, all are used (:80-81).

    `class_weights` scales each foreground RoI's weight inside its own bin
    by its class weight — the GSBBoxHeadWith0Reweight variant
    (gs_bbox_head_with0_reweight.py, cls_weight file).
    """
    logits = cls_logits.astype(jnp.float32)
    label2binlabel = jnp.asarray(partition.label2binlabel)  # (B, C)
    bins = _bin_slices(logits, partition)
    num_bins = partition.num_bins

    losses = {}
    keys = jax.random.split(key, num_bins)
    validf = roi_valid.astype(jnp.float32)
    n = labels.shape[0]
    for i in range(num_bins):
        bin_labels = label2binlabel[i][labels]  # (N,)
        if i == 0:
            weight = validf
        else:
            fg = (bin_labels > 0) & roi_valid
            fg_num = jnp.sum(fg)
            others = roi_valid & ~fg
            others_num = jnp.sum(others)
            budget = (fg_num.astype(jnp.float32) * others_sample_ratio).astype(
                jnp.int32
            )
            # rank others by random priority; keep the first `budget`
            prio = jnp.where(others, jax.random.uniform(keys[i], (n,)), -jnp.inf)
            order = jnp.argsort(-prio)
            ranks = jnp.zeros(n, jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32)
            )
            sampled_others = others & (ranks < budget)
            weight = jnp.where(
                budget >= others_num,
                (fg | others).astype(jnp.float32),
                (fg | sampled_others).astype(jnp.float32),
            )
            # no foreground in this bin -> whole bin skipped
            weight = jnp.where(fg_num > 0, weight, 0.0)
            if class_weights is not None:  # GS-reweight: fg rois only
                weight = jnp.where(fg, weight * class_weights[labels], weight)
        avg = jnp.maximum(jnp.sum(weight), 1.0)
        losses[f"loss_cls_bin{i}"] = softmax_cross_entropy(
            bins[i], bin_labels, weight=weight, avg_factor=avg
        )
    return losses


import functools


@functools.lru_cache(maxsize=8)
def _gather_matrix(partition: GSPartition):
    """(L, C) one-hot permutation: probs @ M == probs[:, label2logit].

    Gathers lower onto the MXU as a matmul — far faster on TPU than a
    row-gather over the 1236-logit axis. Cached per partition (GSPartition
    hashes by identity)."""
    import numpy as np

    l = partition.num_logits
    c = partition.num_classes
    m = np.zeros((l, c), np.float32)
    m[partition.label2logit, np.arange(c)] = 1.0
    # return the HOST array: a jnp constant created inside one jit trace
    # would leak that trace's tracer into every later trace via the cache
    return m


def gs_merge_scores(
    cls_logits: jnp.ndarray,  # (N, L)
    partition: GSPartition,
) -> jnp.ndarray:
    """Calibrated merged scores (N, num_classes) — `_merge_score` parity.

    Per-bin softmax; foreground class probabilities routed from their bins
    via the constant `label2logit` permutation (as one MXU matmul) and
    decayed by bin-0's foreground probability; class 0 keeps bin-0's
    background probability.
    """
    logits = cls_logits.astype(jnp.float32)
    probs = jnp.concatenate(
        [jax.nn.softmax(b, axis=-1) for b in _bin_slices(logits, partition)], axis=-1
    )  # (N, L)
    fg_weight = probs[:, 1:2]  # bin-0 P(foreground)
    gathered = jnp.dot(
        probs, _gather_matrix(partition), preferred_element_type=jnp.float32
    )  # (N, C): col 0 = bin-0 bg prob
    scores = jnp.concatenate(
        [gathered[:, :1], gathered[:, 1:] * fg_weight], axis=-1
    )
    return scores

"""Random pos/neg RoI sampling with static output shapes.

Parity: /root/reference/mmdet/core/bbox/samplers/random_sampler.py and
base_sampler.py. The reference draws `num * pos_fraction` positives (all
positives if fewer) and fills the remainder with random negatives, placing
positives first. Here the same policy is expressed as a single top-k over
randomized priorities, which jits to static shapes:

- every eligible positive gets priority 2 + U(0,1), capped at the expected
  positive count by demoting overflow positives (uniformly chosen) to -inf;
- every eligible negative gets priority U(0,1), capped at (num - n_pos) by
  validity masking after selection;
- top-k(num) then yields [positives..., negatives...] exactly like
  bbox_target_single's pos-first concatenation (bbox_target.py:43-59).

Randomness comes from `jax.random` keys threaded through the train step —
replacing the reference's np.random host calls (random_sampler.py:18-33).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .assigner import AssignResult


class SamplingResult(NamedTuple):
    inds: jnp.ndarray  # (num,) int32 indices into the proposal array
    is_pos: jnp.ndarray  # (num,) bool — slot holds a positive sample
    valid: jnp.ndarray  # (num,) bool — slot holds any real sample
    num_pos: jnp.ndarray  # () int32
    num_neg: jnp.ndarray  # () int32


def _rank_among(mask: jnp.ndarray, priority: jnp.ndarray) -> jnp.ndarray:
    """Rank (0-based) of each element among `mask` elements by descending
    priority; invalid elements get a rank past the end."""
    n = mask.shape[0]
    p = jnp.where(mask, priority, -jnp.inf)
    order = jnp.argsort(-p)  # indices sorted by priority desc
    ranks = jnp.zeros(n, dtype=jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, ranks, n)


def sample_pos_neg(
    key: jax.Array,
    assign: AssignResult,
    num: int,
    pos_fraction: float,
    pos_priority: jnp.ndarray | None = None,
    neg_priority: jnp.ndarray | None = None,
) -> SamplingResult:
    """Sample `num` RoIs: up to num*pos_fraction positives + negatives.

    With default (None) priorities both sides sample uniformly at random —
    RandomSampler parity. Passing structured priorities (higher = keep
    first) yields the reference's sampler family: per-instance balancing,
    IoU-balanced negatives, OHEM hard mining (see the priority builders
    below); the reference implements each as a separate BaseSampler subclass
    (core/bbox/samplers/) — here they are one top-k with a different key.
    """
    n = assign.gt_inds.shape[0]
    num_expected_pos = int(num * pos_fraction)

    kp, kn = jax.random.split(key)
    is_pos_cand = assign.gt_inds > 0
    is_neg_cand = assign.gt_inds == 0

    if pos_priority is None:
        pos_priority = jax.random.uniform(kp, (n,))
    if neg_priority is None:
        neg_priority = jax.random.uniform(kn, (n,))
    pos_rank = _rank_among(is_pos_cand, pos_priority)
    neg_rank = _rank_among(is_neg_cand, neg_priority)

    pos_elig = is_pos_cand & (pos_rank < num_expected_pos)
    n_pos = jnp.sum(pos_elig).astype(jnp.int32)
    n_neg_wanted = num - n_pos
    neg_elig = is_neg_cand & (neg_rank < n_neg_wanted)
    n_neg = jnp.sum(neg_elig).astype(jnp.int32)

    # positives sort first (+2 offset); ties impossible (distinct uniforms).
    prio = jnp.where(
        pos_elig,
        2.0 - pos_rank.astype(jnp.float32) / n,
        jnp.where(neg_elig, 1.0 - neg_rank.astype(jnp.float32) / n, -jnp.inf),
    )
    k = min(num, n)
    top_prio, inds = jax.lax.top_k(prio, k)
    if k < num:  # fewer candidates than slots: pad with invalid slots
        top_prio = jnp.concatenate([top_prio, jnp.full(num - k, -jnp.inf)])
        inds = jnp.concatenate([inds, jnp.zeros(num - k, inds.dtype)])
    slot = jnp.arange(num, dtype=jnp.int32)
    return SamplingResult(
        inds=inds.astype(jnp.int32),
        is_pos=slot < n_pos,
        valid=(slot < n_pos + n_neg) & jnp.isfinite(top_prio),
        num_pos=n_pos,
        num_neg=n_neg,
    )


def instance_balanced_pos_priority(
    key: jax.Array, assign: AssignResult
) -> jnp.ndarray:
    """Positives spread evenly across GT instances.

    Parity: InstanceBalancedPosSampler (instance_balanced_pos_sampler.py:9-41)
    — caps samples per GT then fills. Here each positive gets priority
    -(its random rank within its own GT's positives), so top-k drains GTs
    round-robin: one from each GT, then a second from each, ...
    """
    n = assign.gt_inds.shape[0]
    is_pos = assign.gt_inds > 0
    r = jax.random.uniform(key, (n,))
    # rank within gt group: count of same-gt positives with smaller random key
    same_gt = (assign.gt_inds[:, None] == assign.gt_inds[None, :]) & is_pos[None, :]
    within = jnp.sum(same_gt & (r[None, :] < r[:, None]), axis=1)
    return -(within.astype(jnp.float32)) + r * 0.5


def iou_balanced_neg_priority(
    key: jax.Array,
    assign: AssignResult,
    floor_thr: float = -1.0,
    num_bins: int = 3,
    max_iou: float = 0.5,
) -> jnp.ndarray:
    """Negatives drawn evenly across IoU bins (Libra R-CNN).

    Parity: IoUBalancedNegSampler (iou_balanced_neg_sampler.py:44-75): bins
    of [floor_thr, max_iou) sampled evenly; below-floor negatives rank after
    in-bin ones at equal depth. Priority = -(random rank within own bin).
    """
    n = assign.gt_inds.shape[0]
    is_neg = assign.gt_inds == 0
    lo = max(floor_thr, 0.0)
    span = max(max_iou - lo, 1e-6)
    bin_id = jnp.clip(
        jnp.floor((assign.max_overlaps - lo) / span * num_bins), 0, num_bins - 1
    ).astype(jnp.int32)
    r = jax.random.uniform(key, (n,))
    same_bin = (bin_id[:, None] == bin_id[None, :]) & is_neg[None, :]
    within = jnp.sum(same_bin & (r[None, :] < r[:, None]), axis=1)
    return -(within.astype(jnp.float32)) + r * 0.5


def ohem_priority(cls_loss_per_roi: jnp.ndarray) -> jnp.ndarray:
    """Hard-example mining: highest current classification loss first.

    Parity: OHEMSampler.hard_mining (ohem_sampler.py:33-48) — the caller
    computes per-candidate CE loss with the current head (no grad) and
    passes it as the priority for both sides.
    """
    return cls_loss_per_roi


def pseudo_sample(assign: AssignResult) -> SamplingResult:
    """Keep every assigned proposal (PseudoSampler parity — used where the
    head trains on all anchors, e.g. single-stage detectors)."""
    n = assign.gt_inds.shape[0]
    is_pos = assign.gt_inds > 0
    valid = assign.gt_inds >= 0
    return SamplingResult(
        inds=jnp.arange(n, dtype=jnp.int32),
        is_pos=is_pos,
        valid=valid,
        num_pos=jnp.sum(is_pos).astype(jnp.int32),
        num_neg=jnp.sum(valid & ~is_pos).astype(jnp.int32),
    )


def add_gt_as_proposals(
    proposals: jnp.ndarray,  # (P, 4)
    prop_mask: jnp.ndarray,  # (P,) bool
    assign: AssignResult,
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,) int32
    gt_mask: jnp.ndarray,  # (G,) bool
):
    """Prepend GT boxes as guaranteed-positive proposals.

    Parity: BaseSampler.sample with add_gt_as_proposals=True
    (base_sampler.py:78) — GTs are concatenated before the proposals and
    self-assigned (gt index i+1, overlap 1.0).
    Returns (boxes (G+P,4), mask (G+P,), AssignResult over G+P).
    """
    g = gt_boxes.shape[0]
    boxes = jnp.concatenate([gt_boxes, proposals], axis=0)
    mask = jnp.concatenate([gt_mask, prop_mask], axis=0)
    gt_self = jnp.where(gt_mask, jnp.arange(1, g + 1, dtype=jnp.int32), -1)
    new_assign = AssignResult(
        gt_inds=jnp.concatenate([gt_self, assign.gt_inds]),
        max_overlaps=jnp.concatenate(
            [jnp.where(gt_mask, 1.0, 0.0), assign.max_overlaps]
        ),
        labels=jnp.concatenate(
            [jnp.where(gt_mask, gt_labels, 0).astype(jnp.int32), assign.labels]
        ),
    )
    return boxes, mask, new_assign

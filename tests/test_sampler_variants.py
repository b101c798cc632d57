import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.core.assigner import AssignResult
from balancedgroupsoftmax_tpu.core.sampler import (
    instance_balanced_pos_priority,
    iou_balanced_neg_priority,
    ohem_priority,
    pseudo_sample,
    sample_pos_neg,
)


def _assign(gt_inds, overlaps=None):
    gt_inds = np.asarray(gt_inds, np.int32)
    n = len(gt_inds)
    return AssignResult(
        gt_inds=jnp.asarray(gt_inds),
        max_overlaps=jnp.asarray(
            overlaps if overlaps is not None else np.zeros(n, np.float32)
        ),
        labels=jnp.asarray((gt_inds > 0).astype(np.int32)),
    )


def test_instance_balanced_pos_spreads_across_gts():
    # gt 1 has 90 positives, gt 2 has 10 — balanced sampling of 20 should
    # take ~10 from each rather than ~18/2.
    gt_inds = np.zeros(200, np.int32)
    gt_inds[:90] = 1
    gt_inds[90:100] = 2
    assign = _assign(gt_inds)
    prio = instance_balanced_pos_priority(jax.random.PRNGKey(0), assign)
    res = sample_pos_neg(
        jax.random.PRNGKey(1), assign, num=20, pos_fraction=1.0, pos_priority=prio
    )
    chosen = np.asarray(res.inds)[np.asarray(res.is_pos & res.valid)]
    from_gt2 = (np.asarray(gt_inds)[chosen] == 2).sum()
    assert from_gt2 == 10  # all of gt2's positives selected


def test_iou_balanced_neg_covers_bins():
    rng = np.random.RandomState(0)
    gt_inds = np.zeros(300, np.int32)
    overlaps = np.concatenate(
        [rng.uniform(0.0, 0.17, 260), rng.uniform(0.17, 0.34, 30), rng.uniform(0.34, 0.5, 10)]
    ).astype(np.float32)
    assign = _assign(gt_inds, overlaps)
    prio = iou_balanced_neg_priority(jax.random.PRNGKey(0), assign, num_bins=3)
    res = sample_pos_neg(
        jax.random.PRNGKey(1), assign, num=30, pos_fraction=0.0, neg_priority=prio
    )
    chosen = np.asarray(res.inds)[np.asarray(res.valid)]
    high_bin = (overlaps[chosen] >= 0.34).sum()
    # uniform sampling would pick ~1 from the top bin; balanced picks ~10
    assert high_bin >= 8


def test_ohem_priority_picks_hard():
    gt_inds = np.zeros(100, np.int32)
    loss = np.linspace(0, 1, 100).astype(np.float32)
    assign = _assign(gt_inds)
    res = sample_pos_neg(
        jax.random.PRNGKey(0), assign, num=10, pos_fraction=0.0,
        neg_priority=ohem_priority(jnp.asarray(loss)),
    )
    chosen = np.asarray(res.inds)[np.asarray(res.valid)]
    assert set(chosen) == set(range(90, 100))  # the 10 hardest


def test_pseudo_sample():
    gt_inds = np.array([1, 0, -1, 2, 0], np.int32)
    res = pseudo_sample(_assign(gt_inds))
    assert int(res.num_pos) == 2
    assert int(res.num_neg) == 2
    np.testing.assert_array_equal(np.asarray(res.valid), [True, True, False, True, True])

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.gs import (
    GSPartition,
    gs_loss,
    gs_merge_scores,
    make_partition,
)
from balancedgroupsoftmax_tpu.gs.partition import synthetic_partition


def small_partition():
    # 9 classes (label 0 = bg) with counts placing them in known bins
    counts = np.array([0, 5, 50, 500, 5000, 7, 70, 700, 7000])
    return make_partition(counts), counts


def test_make_partition_structure():
    p, counts = small_partition()
    assert p.num_bins == 5
    assert p.num_classes == 9
    # bin 0: [0, 1, 1, ...]
    np.testing.assert_array_equal(p.label2binlabel[0], [0, 1, 1, 1, 1, 1, 1, 1, 1])
    # labels 1 and 5 (counts 5, 7) in bin 1 with within-bin labels 1, 2
    assert p.label2binlabel[1][1] == 1 and p.label2binlabel[1][5] == 2
    assert p.label2binlabel[2][2] == 1 and p.label2binlabel[2][6] == 2
    assert p.label2binlabel[4][4] == 1 and p.label2binlabel[4][8] == 2
    # pred_slice: bin 0 has 2 logits; each fg bin has 1 + 2 slots
    np.testing.assert_array_equal(p.pred_slice[:, 1], [2, 3, 3, 3, 3])
    np.testing.assert_array_equal(p.pred_slice[:, 0], [0, 2, 5, 8, 11])
    assert p.num_logits == 9 + 5
    # label2logit consistency: each label's slot is in its bin's slice
    for label in range(1, 9):
        b = p.label2bin[label]
        pos = p.label2logit[label]
        assert p.pred_slice[b, 0] < pos < p.pred_slice[b, 0] + p.pred_slice[b, 1]
    # all fg logit slots distinct
    assert len(set(p.label2logit.tolist())) == 9


def np_merge_score(logits, p: GSPartition):
    """Literal numpy port of _merge_score (gs_bbox_head_with0.py:239-273)."""

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    n = logits.shape[0]
    c = p.num_classes
    slices = []
    for b in range(p.num_bins):
        s, ln = p.pred_slice[b]
        slices.append(softmax(logits[:, s : s + ln]))
    bg_score = slices[0]
    fg_merge = np.zeros((n, c))
    for b in range(1, p.num_bins):
        split = np.where(p.label2bin == b)[0]  # global labels in this bin
        fg_merge[:, split] = slices[b][:, 1:]
    fg_merge = bg_score[:, 1:2] * fg_merge
    merge = np.zeros((n, c))
    merge[:, 0] = bg_score[:, 0]
    merge[:, 1:] = fg_merge[:, 1:]
    return merge


def test_gs_merge_scores_matches_reference_math():
    p, _ = small_partition()
    rng = np.random.RandomState(0)
    logits = rng.randn(16, p.num_logits).astype(np.float32)
    got = np.asarray(gs_merge_scores(jnp.asarray(logits), p))
    expected = np_merge_score(logits, p)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_gs_merge_scores_large_partition():
    p = synthetic_partition(1231)
    rng = np.random.RandomState(1)
    logits = rng.randn(8, p.num_logits).astype(np.float32)
    got = np.asarray(gs_merge_scores(jnp.asarray(logits), p))
    expected = np_merge_score(logits, p)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


def test_gs_loss_bin0_and_weights():
    p, _ = small_partition()
    n = 64
    rng = np.random.RandomState(2)
    logits = rng.randn(n, p.num_logits).astype(np.float32)
    labels = np.zeros(n, np.int32)
    labels[:8] = [1, 5, 2, 6, 3, 7, 4, 8]  # two fg per bin
    valid = np.ones(n, bool)

    losses = gs_loss(
        jax.random.PRNGKey(0),
        jnp.asarray(logits),
        jnp.asarray(labels),
        jnp.asarray(valid),
        p,
        others_sample_ratio=8.0,
    )
    assert set(losses) == {f"loss_cls_bin{i}" for i in range(5)}
    for v in losses.values():
        assert np.isfinite(float(v)) and float(v) >= 0

    # bin 0 loss is plain CE over all rois with binary labels
    from balancedgroupsoftmax_tpu.ops.losses import softmax_cross_entropy

    bin0 = softmax_cross_entropy(
        jnp.asarray(logits[:, :2]),
        jnp.asarray((labels > 0).astype(np.int32)),
        weight=jnp.ones(n),
        avg_factor=n,
    )
    np.testing.assert_allclose(float(losses["loss_cls_bin0"]), float(bin0), rtol=1e-6)


def test_gs_loss_empty_bin_is_zero():
    p, _ = small_partition()
    n = 32
    rng = np.random.RandomState(3)
    logits = rng.randn(n, p.num_logits).astype(np.float32)
    labels = np.zeros(n, np.int32)
    labels[:2] = [4, 8]  # only bin 4 has foreground
    losses = gs_loss(
        jax.random.PRNGKey(1),
        jnp.asarray(logits),
        jnp.asarray(labels),
        jnp.ones(n, bool),
        p,
    )
    assert float(losses["loss_cls_bin1"]) == 0.0
    assert float(losses["loss_cls_bin2"]) == 0.0
    assert float(losses["loss_cls_bin3"]) == 0.0
    assert float(losses["loss_cls_bin4"]) > 0.0


def test_gs_loss_others_sampling_ratio():
    """With few fg and many others, weight count = fg + ratio * fg."""
    p, _ = small_partition()
    n = 512
    labels = np.zeros(n, np.int32)
    labels[:4] = 4  # 4 fg rois for bin 4
    logits = np.zeros((n, p.num_logits), np.float32)

    # re-derive weights by introspecting the loss value: with uniform logits,
    # CE is constant per roi, so loss = const regardless of which others were
    # sampled — instead check through the avg factor: loss equals CE(const).
    losses = gs_loss(
        jax.random.PRNGKey(2),
        jnp.asarray(logits),
        jnp.asarray(labels),
        jnp.ones(n, bool),
        p,
        others_sample_ratio=8.0,
    )
    # bin4 slice has 3 logits -> CE = log(3) for every roi; weighted mean = log(3)
    np.testing.assert_allclose(float(losses["loss_cls_bin4"]), np.log(3), rtol=1e-5)


def test_gs_loss_invalid_rois_excluded():
    p, _ = small_partition()
    n = 16
    rng = np.random.RandomState(4)
    logits = rng.randn(n, p.num_logits).astype(np.float32)
    labels = np.zeros(n, np.int32)
    labels[0] = 1
    valid = np.zeros(n, bool)
    valid[:8] = True

    l1 = gs_loss(
        jax.random.PRNGKey(5), jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid), p
    )
    # mutating invalid rois must not change any loss
    logits2 = logits.copy()
    logits2[8:] += 100.0
    labels2 = labels.copy()
    labels2[8:] = 3
    l2 = gs_loss(
        jax.random.PRNGKey(5), jnp.asarray(logits2), jnp.asarray(labels2), jnp.asarray(valid), p
    )
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]), rtol=1e-6)

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.config import RCNNTrainConfig, RPNTrainConfig
from balancedgroupsoftmax_tpu.core.assigner import assign_max_iou
from balancedgroupsoftmax_tpu.core.sampler import sample_pos_neg
from balancedgroupsoftmax_tpu.core.targets import anchor_targets_single, roi_targets_single


def _assign(proposals, gts, labels, **kw):
    p = jnp.asarray(proposals, jnp.float32)
    g = jnp.asarray(gts, jnp.float32)
    lab = jnp.asarray(labels, jnp.int32)
    return assign_max_iou(
        p,
        jnp.ones(p.shape[0], bool),
        g,
        lab,
        jnp.ones(g.shape[0], bool),
        **kw,
    )


def test_assigner_four_step_rule():
    # gt0 at [0,0,9,9]; proposals: exact match, half overlap, far away,
    # low-iou-but-best-for-gt1
    proposals = [
        [0, 0, 9, 9],  # iou 1.0 with gt0 -> pos
        [5, 0, 14, 9],  # iou 0.333 with gt0 -> neg (between .333<0.5)
        [50, 50, 59, 59],  # iou 0 -> neg
        [95, 95, 99, 99],  # best for gt1 though iou < pos_thr
    ]
    gts = [[0, 0, 9, 9], [90, 90, 99, 99]]
    res = _assign(
        proposals, gts, [3, 7], pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.1
    )
    gt_inds = np.asarray(res.gt_inds)
    assert gt_inds[0] == 1  # step 3: above pos thr
    assert gt_inds[1] == 0  # neg
    assert gt_inds[2] == 0
    assert gt_inds[3] == 2  # step 4: gt1 claims its best proposal
    assert np.asarray(res.labels).tolist() == [3, 0, 0, 7]


def test_assigner_padded_gts_ignored():
    proposals = [[0, 0, 9, 9], [20, 20, 29, 29]]
    gts = jnp.asarray([[0, 0, 9, 9], [20, 20, 29, 29]], jnp.float32)
    res = assign_max_iou(
        jnp.asarray(proposals, jnp.float32),
        jnp.ones(2, bool),
        gts,
        jnp.asarray([4, 9], jnp.int32),
        jnp.asarray([True, False]),  # gt1 is padding
        pos_iou_thr=0.5,
        neg_iou_thr=0.5,
        min_pos_iou=0.5,
    )
    gt_inds = np.asarray(res.gt_inds)
    assert gt_inds[0] == 1
    assert gt_inds[1] == 0  # padded gt cannot claim


def test_assigner_padded_proposals_ignored():
    res = assign_max_iou(
        jnp.asarray([[0, 0, 9, 9], [0, 0, 9, 9]], jnp.float32),
        jnp.asarray([True, False]),
        jnp.asarray([[0, 0, 9, 9]], jnp.float32),
        jnp.asarray([5], jnp.int32),
        jnp.ones(1, bool),
        pos_iou_thr=0.5,
        neg_iou_thr=0.5,
    )
    assert np.asarray(res.gt_inds).tolist() == [1, -1]


def test_sampler_ratio_and_ordering():
    n = 1000
    rng = np.random.RandomState(0)
    gt_inds = np.zeros(n, dtype=np.int32)
    gt_inds[rng.choice(n, 300, replace=False)] = 1  # 300 positives
    from balancedgroupsoftmax_tpu.core.assigner import AssignResult

    assign = AssignResult(
        gt_inds=jnp.asarray(gt_inds),
        max_overlaps=jnp.zeros(n),
        labels=jnp.asarray(gt_inds),
    )
    res = sample_pos_neg(jax.random.PRNGKey(0), assign, num=512, pos_fraction=0.25)
    assert int(res.num_pos) == 128  # capped at num * pos_fraction
    assert int(res.num_neg) == 384
    inds = np.asarray(res.inds)
    assert len(np.unique(inds)) == 512  # no replacement
    # positives first
    assert np.asarray(res.is_pos)[:128].all() and not np.asarray(res.is_pos)[128:].any()
    assert (gt_inds[inds[:128]] == 1).all()
    assert (gt_inds[inds[128:]] == 0).all()


def test_sampler_few_positives():
    n = 100
    gt_inds = np.zeros(n, dtype=np.int32)
    gt_inds[:5] = 1
    from balancedgroupsoftmax_tpu.core.assigner import AssignResult

    assign = AssignResult(
        gt_inds=jnp.asarray(gt_inds), max_overlaps=jnp.zeros(n), labels=jnp.asarray(gt_inds)
    )
    res = sample_pos_neg(jax.random.PRNGKey(1), assign, num=512, pos_fraction=0.25)
    assert int(res.num_pos) == 5
    assert int(res.num_neg) == 95  # only 95 negatives exist
    assert int(np.asarray(res.valid).sum()) == 100


def test_roi_targets_shapes_and_semantics():
    key = jax.random.PRNGKey(0)
    P, G, S = 64, 8, 32
    rng = np.random.RandomState(0)
    props = rng.uniform(0, 80, (P, 4)).astype(np.float32)
    props[:, 2:] += props[:, :2]
    gts = np.array([[0, 0, 20, 20], [40, 40, 70, 70]], np.float32)
    gt_boxes = np.zeros((G, 4), np.float32)
    gt_boxes[:2] = gts
    gt_mask = np.zeros(G, bool)
    gt_mask[:2] = True
    gt_labels = np.zeros(G, np.int32)
    gt_labels[:2] = [3, 1000]

    cfg = RCNNTrainConfig()
    cfg = cfg.__class__(
        assigner=cfg.assigner, sampler=cfg.sampler.__class__(num=S, pos_fraction=0.25)
    )
    out = roi_targets_single(
        key,
        jnp.asarray(props),
        jnp.ones(P, bool),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_mask),
        cfg,
    )
    assert out.rois.shape == (S, 4)
    labels = np.asarray(out.labels)
    is_pos = labels > 0
    # add_gt_as_proposals guarantees >= 2 positives (the GTs themselves)
    assert int(out.num_pos) >= 2
    assert set(labels[is_pos]) <= {3, 1000}
    # positive bbox targets are finite; negatives zero-weighted
    np.testing.assert_allclose(np.asarray(out.bbox_weights)[~is_pos], 0.0)
    assert np.isfinite(np.asarray(out.bbox_targets)).all()


def test_anchor_targets_single():
    key = jax.random.PRNGKey(2)
    # small anchor grid around two gts
    from balancedgroupsoftmax_tpu.core.anchors import grid_anchors

    anchors = jnp.asarray(grid_anchors((16, 16), 8, 8, (4.0,), (1.0,)))
    n = anchors.shape[0]
    gt = jnp.asarray([[10, 10, 50, 50], [80, 80, 120, 120]], jnp.float32)
    cfg = RPNTrainConfig()
    out = anchor_targets_single(
        key,
        anchors,
        jnp.ones(n, bool),
        gt,
        jnp.ones(2, bool),
        img_shape=(128, 128),
        cfg=cfg,
    )
    labels = np.asarray(out.labels)
    lw = np.asarray(out.label_weights)
    assert labels.shape == (n,)
    assert (labels[lw == 0] == 0).all()
    assert int(out.num_pos) >= 1
    # sampled count = 256 or all available
    assert lw.sum() <= cfg.sampler.num
    # positives have bbox weight 1
    bw = np.asarray(out.bbox_weights)
    assert (bw[labels == 1] == 1).all()
    assert (bw[labels == 0] == 0).all()

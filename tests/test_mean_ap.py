import numpy as np

from balancedgroupsoftmax_tpu.eval.mean_ap import (
    average_precision,
    eval_map,
    eval_recalls,
    tpfp_default,
)
from balancedgroupsoftmax_tpu.ops.roi_pool import roi_pool


def test_tpfp_basic():
    dets = np.array([[0, 0, 9, 9, 0.9], [50, 50, 59, 59, 0.8], [0, 0, 9, 9, 0.7]])
    gts = np.array([[0, 0, 9, 9]], np.float64)
    tp, fp = tpfp_default(dets, gts, iou_thr=0.5)
    np.testing.assert_array_equal(tp[0], [1, 0, 0])  # best-score match wins
    np.testing.assert_array_equal(fp[0], [0, 1, 1])  # duplicate + miss are fp


def test_average_precision_area():
    recalls = np.array([0.5, 1.0])
    precisions = np.array([1.0, 0.5])
    ap = average_precision(recalls, precisions, "area")
    np.testing.assert_allclose(ap[0], 0.5 * 1.0 + 0.5 * 0.5, atol=1e-6)


def test_eval_map_perfect():
    gts = [np.array([[0, 0, 9, 9], [20, 20, 29, 29]], np.float64)]
    labels = [np.array([1, 2])]
    dets = [[
        np.array([[0, 0, 9, 9, 0.9]]),
        np.array([[20, 20, 29, 29, 0.8]]),
    ]]
    mAP, per_cls = eval_map(dets, gts, labels, num_classes=2)
    np.testing.assert_allclose(mAP, 1.0, atol=1e-6)


def test_eval_recalls():
    gts = [np.array([[0, 0, 9, 9], [50, 50, 59, 59]], np.float64)]
    props = [np.array([[0, 0, 9, 9, 0.9], [100, 100, 109, 109, 0.5]], np.float64)]
    r = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5,))
    np.testing.assert_allclose(r[:, 0], [0.5, 0.5])


def test_roi_pool_max_semantics():
    import jax.numpy as jnp

    feat = np.zeros((8, 8, 1), np.float32)
    feat[2, 3, 0] = 5.0
    feat[6, 6, 0] = 7.0
    rois = jnp.asarray([[0, 0, 7, 7]], jnp.float32)
    out = np.asarray(roi_pool(jnp.asarray(feat), rois, 1.0, out_size=2))
    assert out.shape == (1, 2, 2, 1)
    assert out[0, 0, 0, 0] == 5.0  # top-left quadrant max
    assert out[0, 1, 1, 0] == 7.0  # bottom-right quadrant max
    assert out[0, 0, 1, 0] == 0.0  # empty quadrant

import numpy as np
import pytest

from balancedgroupsoftmax_tpu import native
from balancedgroupsoftmax_tpu.eval.lvis_eval import IOU_THRS
from balancedgroupsoftmax_tpu.eval.lvis_eval import box_iou_xywh as np_iou


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.build(), "native library failed to build (g++)"
    assert native.available()


def test_native_box_iou_matches_numpy():
    rng = np.random.RandomState(0)
    dt = np.abs(rng.randn(20, 4)) * 20 + 1
    gt = np.abs(rng.randn(15, 4)) * 20 + 1
    np.testing.assert_allclose(
        native.box_iou_xywh(dt, gt), np_iou(dt, gt), atol=1e-12
    )
    crowd = np.zeros(15, np.uint8)
    crowd[3] = 1
    np.testing.assert_allclose(
        native.box_iou_xywh(dt, gt, crowd), np_iou(dt, gt, crowd), atol=1e-12
    )


def np_greedy_match(ious, thrs, gt_ig):
    nd, ng = ious.shape
    t = len(thrs)
    gt_m = np.zeros((t, ng))
    dt_m = np.zeros((t, nd))
    dt_ig = np.zeros((t, nd), np.int8)
    for ti, thr in enumerate(thrs):
        for di in range(nd):
            best = min(thr, 1 - 1e-10)
            m = -1
            for gi in range(ng):
                if gt_m[ti, gi] > 0:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gi] == 1:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                m = gi
            if m == -1:
                continue
            dt_ig[ti, di] = gt_ig[m]
            dt_m[ti, di] = m + 1
            gt_m[ti, m] = di + 1
    return dt_m, gt_m, dt_ig


def test_native_matcher_matches_python():
    rng = np.random.RandomState(1)
    for _ in range(10):
        nd, ng = rng.randint(1, 15), rng.randint(1, 10)
        ious = rng.rand(nd, ng)
        gt_ig = (rng.rand(ng) < 0.3).astype(np.int8)
        # gts sorted ignore-last as the evaluator guarantees
        order = np.argsort(gt_ig, kind="stable")
        ious = ious[:, order]
        gt_ig = gt_ig[order]
        got = native.greedy_match(ious, IOU_THRS, gt_ig)
        exp = np_greedy_match(ious, IOU_THRS, gt_ig)
        for a, b in zip(got, exp):
            np.testing.assert_allclose(a, b)


def test_native_mask_iou():
    rng = np.random.RandomState(2)
    a = (rng.rand(4, 100) > 0.5).astype(np.uint8)
    b = (rng.rand(3, 100) > 0.5).astype(np.uint8)
    got = native.mask_iou_bitmaps(a, b)
    inter = (a[:, None] & b[None]).sum(-1)
    union = a.sum(-1)[:, None] + b.sum(-1)[None] - inter
    np.testing.assert_allclose(got, inter / union, atol=1e-12)


def test_evaluator_uses_native_same_results():
    """Full evaluator result identical with and without the native matcher."""
    import balancedgroupsoftmax_tpu.eval.lvis_eval as le
    from tests.test_lvis_eval import ann, det, make_gt

    gt = make_gt()
    gt["annotations"] = [
        ann(1, 1, 10, 10, 20, 20, 1),
        ann(1, 1, 50, 50, 30, 30, 2),
        ann(2, 2, 5, 5, 40, 40, 3),
    ]
    rng = np.random.RandomState(3)
    dets = []
    for i in range(40):
        img = rng.randint(1, 3)
        cat = rng.randint(1, 3)
        x, y = rng.uniform(0, 60, 2)
        w, h = rng.uniform(5, 40, 2)
        dets.append(det(img, cat, x, y, w, h, float(rng.rand())))
    res_native = dict(le.LvisEvaluator(gt, dets).run())

    # force the python path
    import balancedgroupsoftmax_tpu.native as nat

    orig = nat.greedy_match
    nat.greedy_match = lambda *a, **k: None
    try:
        res_py = dict(le.LvisEvaluator(gt, dets).run())
    finally:
        nat.greedy_match = orig
    for k in res_native:
        np.testing.assert_allclose(res_native[k], res_py[k], atol=1e-12)

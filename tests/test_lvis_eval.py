import numpy as np

from balancedgroupsoftmax_tpu.eval.lvis_eval import LvisEvaluator, box_iou_xywh
from balancedgroupsoftmax_tpu.eval.results import detections_to_records, xyxy2xywh


def make_gt(num_imgs=2):
    cats = [
        dict(id=1, name="a", frequency="f", instance_count=2000),
        dict(id=2, name="b", frequency="c", instance_count=50),
        dict(id=3, name="c", frequency="r", instance_count=5),
    ]
    images = [
        dict(
            id=i + 1,
            width=100,
            height=100,
            neg_category_ids=[],
            not_exhaustive_category_ids=[],
        )
        for i in range(num_imgs)
    ]
    return dict(categories=cats, images=images, annotations=[])


def ann(img, cat, x, y, w, h, aid):
    return dict(
        id=aid, image_id=img, category_id=cat, bbox=[x, y, w, h], area=w * h, ignore=0
    )


def det(img, cat, x, y, w, h, score):
    return dict(image_id=img, category_id=cat, bbox=[x, y, w, h], score=score)


def test_box_iou_xywh():
    a = [[0, 0, 10, 10]]
    b = [[0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]]
    iou = box_iou_xywh(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-9)


def test_perfect_detections_ap1():
    gt = make_gt()
    gt["annotations"] = [
        ann(1, 1, 10, 10, 20, 20, 1),
        ann(1, 2, 50, 50, 30, 30, 2),
        ann(2, 1, 5, 5, 40, 40, 3),
        ann(2, 3, 60, 60, 20, 20, 4),
    ]
    dets = [
        det(a["image_id"], a["category_id"], *a["bbox"], 0.9) for a in gt["annotations"]
    ]
    ev = LvisEvaluator(gt, dets)
    res = ev.run()
    assert abs(res["AP"] - 1.0) < 1e-6
    assert abs(res["AP50"] - 1.0) < 1e-6
    assert abs(res["AR@300"] - 1.0) < 1e-6
    assert abs(res["APr"] - 1.0) < 1e-6
    assert abs(res["APc"] - 1.0) < 1e-6
    assert abs(res["APf"] - 1.0) < 1e-6


def test_fp_halves_ap():
    gt = make_gt(num_imgs=1)
    gt["annotations"] = [ann(1, 1, 10, 10, 20, 20, 1), ann(1, 1, 60, 60, 20, 20, 2)]
    dets = [
        det(1, 1, 10, 10, 20, 20, 0.9),  # TP
        det(1, 1, 30, 5, 10, 10, 0.5),  # FP (no overlap)
    ]
    res = LvisEvaluator(gt, dets).run()
    # recall stops at 0.5; 101-pt AP = 51/101
    np.testing.assert_allclose(res["AP50"], 51 / 101, atol=1e-6)
    np.testing.assert_allclose(res["AR@300"], 0.5, atol=1e-6)


def test_federated_filtering_drops_unknown_category_dets():
    gt = make_gt(num_imgs=1)
    gt["annotations"] = [ann(1, 1, 10, 10, 20, 20, 1)]
    # cat 2 not in pos or neg lists for img 1 -> detection must be ignored
    dets = [
        det(1, 1, 10, 10, 20, 20, 0.9),
        det(1, 2, 10, 10, 20, 20, 0.95),
    ]
    res = LvisEvaluator(gt, dets).run()
    assert abs(res["AP"] - 1.0) < 1e-6  # cat-2 det dropped, no gt for cat 2

    # now mark cat 2 as a *negative* category: the det becomes a real FP,
    # but cat 2 still has no GT anywhere so its AP stays undefined (-1,
    # excluded) — AP over cat 1 remains 1.0
    gt2 = make_gt(num_imgs=1)
    gt2["images"][0]["neg_category_ids"] = [2]
    gt2["annotations"] = [ann(1, 1, 10, 10, 20, 20, 1)]
    res2 = LvisEvaluator(gt2, dets).run()
    assert abs(res2["AP"] - 1.0) < 1e-6


def test_not_exhaustive_ignores_unmatched():
    gt = make_gt(num_imgs=1)
    gt["images"][0]["not_exhaustive_category_ids"] = [1]
    gt["annotations"] = [ann(1, 1, 10, 10, 20, 20, 1)]
    dets = [
        det(1, 1, 10, 10, 20, 20, 0.9),  # TP
        det(1, 1, 60, 60, 20, 20, 0.8),  # unmatched but nel -> ignored
    ]
    res = LvisEvaluator(gt, dets).run()
    assert abs(res["AP"] - 1.0) < 1e-6


def test_max_dets_cap():
    gt = make_gt(num_imgs=1)
    gt["annotations"] = [ann(1, 1, 10, 10, 20, 20, 1)]
    # 400 detections; the single TP has the LOWEST score so the cap drops it
    dets = [det(1, 1, 30 + (i % 50), 60, 5, 5, 0.5 + i * 1e-4) for i in range(400)]
    dets.append(det(1, 1, 10, 10, 20, 20, 0.01))
    res = LvisEvaluator(gt, dets, max_dets=300).run()
    assert res["AP"] == 0.0

    res2 = LvisEvaluator(gt, dets, max_dets=500).run()
    assert res2["AP"] > 0.0


def test_area_ranges():
    gt = make_gt(num_imgs=1)
    # one small (16x16=256 < 1024) and one large (100x100 > 9216) object
    gt["annotations"] = [ann(1, 1, 0, 0, 16, 16, 1), ann(1, 2, 0, 0, 100, 100, 2)]
    dets = [det(1, 1, 0, 0, 16, 16, 0.9), det(1, 2, 0, 0, 100, 100, 0.9)]
    res = LvisEvaluator(gt, dets).run()
    assert abs(res["APs"] - 1.0) < 1e-6
    assert abs(res["APl"] - 1.0) < 1e-6
    assert res["APm"] == -1.0  # no medium objects -> undefined


def test_localization_threshold_sweep():
    gt = make_gt(num_imgs=1)
    gt["annotations"] = [ann(1, 1, 0, 0, 100, 10, 1)]
    # det shifted so IoU = 0.6: matched at thr .5,.55,.6 only
    # overlap width 75 -> iou 75/125 = 0.6
    dets = [det(1, 1, 25, 0, 100, 10, 0.9)]
    res = LvisEvaluator(gt, dets).run()
    # AP = mean over thrs of (1 if 0.6 >= thr else 0) = 3/10
    np.testing.assert_allclose(res["AP"], 3 / 10, atol=1e-6)
    np.testing.assert_allclose(res["AP50"], 1.0, atol=1e-6)
    np.testing.assert_allclose(res["AP75"], 0.0, atol=1e-6)


def test_detections_to_records_conventions():
    boxes = np.array([[10.0, 20.0, 30.0, 50.0]])
    recs = detections_to_records(
        7, boxes, np.array([0.8]), np.array([2]), np.array([True]), cat_ids=[1, 2, 3]
    )
    assert recs[0]["image_id"] == 7
    assert recs[0]["category_id"] == 3
    np.testing.assert_allclose(recs[0]["bbox"], [10, 20, 21, 31])  # +1 convention

"""Bit-for-bit evaluator parity against the ACTUAL vendored lvis-api on the
reference's own real-LVIS 100-image fixture.

SURVEY.md §4 demanded "a lvis_val_100.json-style fixture for bit-for-bit
evaluator parity"; the fixture ships in the reference
(/root/reference/lvis-api/data/lvis_val_100.json: 977 GT annotations,
1230 categories, real neg_category_ids / not_exhaustive_category_ids).
This test imports the REAL `LVISEval` (/root/reference/lvis-api/lvis/
eval.py:15) — the same code that produced the reference's published
25.96/20.98 numbers — and asserts our `LvisEvaluator` reproduces all 13
summary metrics on seeded jittered-GT + false-positive detections.

Offline shims (the lvis-api targets 2019-era numpy + compiled
pycocotools, neither present in this image):
- `pycocotools.mask.iou` -> this repo's `box_iou_xywh` (bbox mode) /
  bitmap IoU over our RLE codec (segm mode). pycocotools returns [] when
  either side is empty; the stub mirrors that.
- `pycocotools.mask.frPyObjects`/`merge` (used by `LVIS.ann_to_rle`,
  lvis.py:236-240) -> our polygon rasterizer + RLE encoder.
- `np.float` (removed in numpy 1.24; eval.py:362) and float `num` to
  `np.linspace` (eval.py:541-545) are shimmed for the import's lifetime.

Segm-mode caveat (documented, not hidden): both evaluators decode
through OUR rasterizer/codec in this image, so the segm test verifies the
evaluator's mask *plumbing* (RLE det areas, mask IoU matching, federated
rules) — the codec itself is validated against hand-derived goldens in
tests/test_mask.py; a pycocotools cross-check needs an image that ships
it (ROADMAP item).
"""

import copy
import importlib
import json
import os
import sys
import types

import numpy as np
import pytest

REF_API = "/root/reference/lvis-api"
FIXTURE = os.path.join(REF_API, "data", "lvis_val_100.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference lvis-api fixture not present"
)

METRICS = [
    "AP", "AP50", "AP75", "APs", "APm", "APl", "APr", "APc", "APf",
    "AR@300", "ARs@300", "ARm@300", "ARl@300",
]


# pycocotools.mask stub: shared functional installer (tests/pycocotools_stub.py)
from tests.pycocotools_stub import install_functional_stub as _install_pycocotools_stub


def _install_numpy_shims():
    if not hasattr(np, "float"):
        np.float = np.float64  # eval.py:362-363
    if not getattr(np.linspace, "_bags_float_num_shim", False):
        orig = np.linspace

        def linspace(start, stop, num=50, **kw):
            return orig(start, stop, int(num), **kw)

        linspace._bags_float_num_shim = True
        np.linspace = linspace


@pytest.fixture(scope="module")
def ref_api():
    _install_pycocotools_stub()
    _install_numpy_shims()
    sys.path.insert(0, REF_API)
    try:
        lvis_mod = importlib.import_module("lvis.lvis")
        eval_mod = importlib.import_module("lvis.eval")
    finally:
        sys.path.remove(REF_API)
    return lvis_mod, eval_mod


@pytest.fixture(scope="module")
def gt_data():
    with open(FIXTURE) as f:
        return json.load(f)


def _synth_detections(gt_data, seed, segm=False):
    """Seeded jittered-GT + false-positive detections over the fixture.

    ~85% of GT boxes emit a jittered detection (10% of those with a wrong
    class), plus 0-3 random-box FPs per image — enough spread that every
    metric (incl. APs/m/l and the r/c/f groups) is exercised away from 0/1.
    """
    rng = np.random.RandomState(seed)
    cat_ids = [c["id"] for c in gt_data["categories"]]
    sizes = {i["id"]: (i["height"], i["width"]) for i in gt_data["images"]}
    dets = []

    def clip_box(img_id, x, y, w, h):
        ih, iw = sizes[img_id]
        x = float(np.clip(x, 0, iw - 2))
        y = float(np.clip(y, 0, ih - 2))
        w = float(np.clip(w, 2, iw - x))
        h = float(np.clip(h, 2, ih - y))
        return [x, y, w, h]

    for ann in gt_data["annotations"]:
        if rng.rand() >= 0.85:
            continue
        x, y, w, h = ann["bbox"]
        jit = rng.randn(4) * [w * 0.08 + 1, h * 0.08 + 1, w * 0.12 + 1, h * 0.12 + 1]
        cat = (
            ann["category_id"]
            if rng.rand() < 0.9
            else int(cat_ids[rng.randint(len(cat_ids))])
        )
        dets.append(
            dict(
                image_id=ann["image_id"],
                category_id=cat,
                bbox=clip_box(ann["image_id"], x + jit[0], y + jit[1], w + jit[2], h + jit[3]),
                score=float(rng.uniform(0.05, 1.0)),
            )
        )
    for img in gt_data["images"]:
        for _ in range(rng.randint(0, 4)):
            ih, iw = sizes[img["id"]]
            w = float(rng.uniform(4, 0.6 * iw))
            h = float(rng.uniform(4, 0.6 * ih))
            dets.append(
                dict(
                    image_id=img["id"],
                    category_id=int(cat_ids[rng.randint(len(cat_ids))]),
                    bbox=clip_box(img["id"], rng.uniform(0, iw - w), rng.uniform(0, ih - h), w, h),
                    score=float(rng.uniform(0.05, 1.0)),
                )
            )
    if segm:
        from balancedgroupsoftmax_tpu.utils.rle import encode_mask

        for d in dets:
            ih, iw = sizes[d["image_id"]]
            x, y, w, h = d["bbox"]
            m = np.zeros((ih, iw), np.uint8)
            m[int(y) : int(y + h), int(x) : int(x + w)] = 1
            # carve a notch so masks aren't exactly their boxes
            m[int(y) : int(y + 0.3 * h), int(x) : int(x + 0.3 * w)] = 0
            d["segmentation"] = encode_mask(m)
            if segm == "no_bbox":
                # the realistic shape: segm2json emits no bbox key
                # (mmdet/core/evaluation/lvis_utils.py:165-172), so
                # LVISResults derives area/bbox from the mask
                # (results.py:54-61)
                del d["bbox"]
    return dets


def _run_reference(ref_api, dets, iou_type):
    lvis_mod, eval_mod = ref_api
    gt = lvis_mod.LVIS(FIXTURE)
    ev = eval_mod.LVISEval(gt, copy.deepcopy(dets), iou_type=iou_type)
    ev.run()
    return ev.get_results()


def _run_ours(gt_data, dets, iou_type):
    from balancedgroupsoftmax_tpu.eval.lvis_eval import LvisEvaluator

    return LvisEvaluator(
        copy.deepcopy(gt_data), copy.deepcopy(dets), iou_type=iou_type
    ).run()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bbox_parity_with_real_lvis_api(ref_api, gt_data, seed):
    dets = _synth_detections(gt_data, seed)
    ref = _run_reference(ref_api, dets, "bbox")
    ours = _run_ours(gt_data, dets, "bbox")
    assert ref["AP"] > 0.05  # the synthetic dets must be non-trivial
    for key in METRICS:
        assert ours[key] == pytest.approx(ref[key], abs=1e-10), key


@pytest.mark.slow
@pytest.mark.parametrize("det_shape", ["no_bbox", True])
def test_segm_parity_with_real_lvis_api(ref_api, gt_data, det_shape):
    """`no_bbox` is the realistic shape (segm2json emits no bbox key;
    LVISResults computes mask area, results.py:54-61); `True` keeps the
    bbox key to pin LVISResults' bbox-area-first precedence
    (results.py:42-52)."""
    dets = _synth_detections(gt_data, seed=0, segm=det_shape)
    ref = _run_reference(ref_api, dets, "segm")
    ours = _run_ours(gt_data, dets, "segm")
    assert ref["AP"] > 0.01
    for key in METRICS:
        assert ours[key] == pytest.approx(ref[key], abs=1e-10), key

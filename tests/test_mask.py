import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balancedgroupsoftmax_tpu.config import MaskHeadConfig
from balancedgroupsoftmax_tpu.models.detector import build_detector
from balancedgroupsoftmax_tpu.ops.mask import (
    mask_target_single,
    paste_mask,
    rasterize_gt_masks,
)
from balancedgroupsoftmax_tpu.utils.rle import (
    counts_to_mask,
    decode_counts,
    decode_rle,
    encode_counts,
    encode_mask,
    mask_iou,
    mask_to_counts,
    polygons_to_mask,
    rle_area,
)
from tests.test_detector import make_batch, tiny_config


def test_rle_counts_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(37, 53) > 0.7).astype(np.uint8)
        counts = mask_to_counts(m)
        assert sum(counts) == m.size
        np.testing.assert_array_equal(counts_to_mask(counts, 37, 53), m)
        s = encode_counts(counts)
        assert decode_counts(s) == counts


def test_rle_encode_known_value():
    # all-zeros then all-ones column-major: counts [6, 6] on a 3x4 mask
    m = np.zeros((3, 4), np.uint8)
    m[:, 2:] = 1
    counts = mask_to_counts(m)
    assert counts == [6, 6]
    rle = encode_mask(m)
    np.testing.assert_array_equal(decode_rle(rle), m)
    assert rle_area(rle) == 6


def test_polygon_rasterization():
    # square polygon from (2,2) to (8,8): COCO semantics rasterize an
    # integer-coordinate rectangle to exactly [y0:y1, x0:x1]
    polys = [[2, 2, 8, 2, 8, 8, 2, 8]]
    m = polygons_to_mask(polys, 12, 12)
    want = np.zeros((12, 12), np.uint8)
    want[2:8, 2:8] = 1
    np.testing.assert_array_equal(m, want)


def test_polygon_rectangles_exact():
    """Integer axis-aligned rectangles fill exactly w*h pixels at
    [y0:y1, x0:x1] — the documented pycocotools frPyObjects behavior the
    exact rasterizer must reproduce (vertex order must not matter)."""
    for (x0, y0, x1, y1) in [(0, 0, 10, 10), (3, 4, 8, 9), (0, 0, 20, 20), (5, 5, 6, 6)]:
        for poly in (
            [x0, y0, x0, y1, x1, y1, x1, y0],  # ccw
            [x0, y0, x1, y0, x1, y1, x0, y1],  # cw
        ):
            m = polygons_to_mask([poly], 20, 20)
            want = np.zeros((20, 20), np.uint8)
            want[y0:y1, x0:x1] = 1
            np.testing.assert_array_equal(m, want)


def test_polygon_half_pixel_offset():
    # boundary at +0.5 rounds inward: the 5x5 square lands at [1:6, 1:6]
    m = polygons_to_mask([[0.5, 0.5, 0.5, 5.5, 5.5, 5.5, 5.5, 0.5]], 10, 10)
    want = np.zeros((10, 10), np.uint8)
    want[1:6, 1:6] = 1
    np.testing.assert_array_equal(m, want)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/lvis-api/data/lvis_val_100.json"),
    reason="reference lvis-api fixture not present",
)
def test_polygon_area_tracks_lvis_goldens():
    """Fidelity statistic over 977 real LVIS polygons: rasterized mask
    areas must track the annotations' continuous (shoelace) polygon areas
    to ~1% mean relative error. A fill-convention bug (e.g. integer-vertex
    rounding a la cv2.fillPoly) shows up as ~10%. Not a bit-for-bit
    pycocotools diff (not available offline) — a gross-regression tripwire.
    """
    import json

    with open("/root/reference/lvis-api/data/lvis_val_100.json") as f:
        d = json.load(f)
    sizes = {i["id"]: (i["height"], i["width"]) for i in d["images"]}
    errs = []
    for a in d["annotations"][::3]:  # every 3rd: keeps the test <15s
        h, w = sizes[a["image_id"]]
        m = polygons_to_mask(a["segmentation"], h, w)
        errs.append(abs(int(m.sum()) - a["area"]) / max(a["area"], 1.0))
    assert float(np.mean(errs)) < 0.02


def test_mask_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[3:8] = 1
    ra, rb = encode_mask(a), encode_mask(b)
    iou = mask_iou([ra], [rb])
    np.testing.assert_allclose(iou[0, 0], 20 / 80, atol=1e-6)


def test_rasterize_and_mask_target_full_box():
    # GT mask fully covers its bbox -> roi==gtbox target is all ones
    seg = [[10, 10, 50, 10, 50, 40, 10, 40]]
    gt_boxes = np.array([[10, 10, 49, 39]], np.float32)
    crops = rasterize_gt_masks([seg], gt_boxes, 64, 64, capacity=2)
    assert crops.shape == (2, 112, 112)
    assert crops[0].mean() > 0.95

    rois = jnp.asarray([[10, 10, 49, 39], [20, 15, 40, 30]], jnp.float32)
    t = mask_target_single(
        rois,
        jnp.asarray(np.pad(gt_boxes, ((0, 1), (0, 0)))),
        jnp.asarray([0, 0], jnp.int32),
        jnp.asarray(crops),
        jnp.asarray([True, True]),
        mask_size=28,
    )
    assert t.shape == (2, 28, 28)
    assert float(t[0].mean()) > 0.95  # roi == gt box: fully inside the mask
    assert float(t[1].mean()) > 0.95  # roi inside gt box


def test_mask_target_outside_gt_is_zero():
    crops = np.zeros((1, 112, 112), np.float32)
    crops[0, :, :56] = 1.0  # left half of the gt box
    gt_boxes = jnp.asarray([[0, 0, 99, 99]], jnp.float32)
    rois = jnp.asarray([[0, 0, 49, 99], [50, 0, 99, 99]], jnp.float32)
    t = mask_target_single(
        rois,
        gt_boxes,
        jnp.asarray([0, 0], jnp.int32),
        jnp.asarray(crops),
        jnp.asarray([True, True]),
    )
    assert float(t[0].mean()) > 0.9  # left-half roi covered
    assert float(t[1].mean()) < 0.1  # right-half roi empty


def test_paste_mask():
    m = np.ones((28, 28), np.float32) * 0.9
    out = paste_mask(m, np.array([10, 20, 19, 29], np.float32), 40, 40)
    assert out.shape == (40, 40)
    assert out[25, 15] == 1
    assert out[:20].sum() == 0
    assert out.sum() == 100  # 10x10 box


def test_mask_rcnn_end_to_end():
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, mask_head=MaskHeadConfig(num_classes=9, conv_out_channels=32, num_convs=2)
    )
    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    assert "mask_head" in variables["params"]

    batch = make_batch()
    b, g = batch[1].shape[:2]
    crops = np.zeros((b, g, 112, 112), np.float32)
    crops[:, :, 20:90, 20:90] = 1.0
    losses = jax.jit(
        lambda v, bt, cr, k: model.apply(
            v, *bt, cr, method="loss", rngs={"sampling": k}
        )
    )(variables, batch, jnp.asarray(crops), jax.random.PRNGKey(1))
    assert "loss_mask" in losses
    assert np.isfinite(float(losses["loss_mask"]))

    # mask prediction on fake detections
    det_boxes = jnp.asarray(
        np.tile(np.array([[10, 10, 60, 60]], np.float32), (2, 5, 1))
    )
    det_labels = jnp.zeros((2, 5), jnp.int32)
    probs = jax.jit(
        lambda v, im, db, dl, sf: model.apply(
            v, im, db, dl, sf, method="predict_masks"
        )
    )(variables, batch[0], det_boxes, det_labels, jnp.ones(2))
    assert probs.shape == (2, 5, 28, 28)
    p = np.asarray(probs)
    assert ((p >= 0) & (p <= 1)).all()

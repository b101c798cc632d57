"""Native C++ pixel path (native/src/bags_loader.cpp) vs the cv2 reference.

The native path must reproduce preprocess_image (data/pipeline.py) —
geometry exactly; pixels within JPEG-decoder/bilinear rounding tolerance
(cv2 uses libjpeg-turbo + fixed-point INTER_LINEAR, the native path
classic libjpeg + float bilinear with the same half-pixel convention).
"""

import os

import cv2
import numpy as np
import pytest

from balancedgroupsoftmax_tpu import native
from balancedgroupsoftmax_tpu.data.pipeline import (
    PipelineConfig,
    preprocess_image,
    preprocess_image_file,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _write_jpeg(path, h, w, seed=0, quality=95):
    rng = np.random.RandomState(seed)
    # smooth image so JPEG loss is small and decoder diffs stay tiny
    base = rng.randint(0, 255, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, quality])
    return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)


def test_jpeg_dims(tmp_path):
    p = str(tmp_path / "a.jpg")
    _write_jpeg(p, 123, 457)
    with open(p, "rb") as f:
        assert native.jpeg_dims(f.read()) == (457, 123)


@pytest.mark.parametrize("hw", [(300, 500), (500, 300)])
def test_native_matches_cv2_eval(tmp_path, hw):
    h, w = hw
    p = str(tmp_path / "img.jpg")
    img = _write_jpeg(p, h, w)
    cfg = PipelineConfig(scale=(256, 160), max_gt_boxes=10)
    boxes = np.array([[10.0, 10.0, 60.0, 50.0]], np.float32)
    labels = np.array([3], np.int32)

    ref = preprocess_image(img, boxes, labels, cfg, train=False)
    got = preprocess_image_file(p, boxes, labels, cfg, train=False)

    assert got["bucket"] == ref["bucket"]
    np.testing.assert_array_equal(got["img_shape"], ref["img_shape"])
    assert got["scale_factor"] == pytest.approx(ref["scale_factor"])
    np.testing.assert_allclose(got["gt_boxes"], ref["gt_boxes"], atol=1e-5)
    np.testing.assert_array_equal(got["gt_labels"], ref["gt_labels"])
    np.testing.assert_array_equal(got["gt_mask"], ref["gt_mask"])
    # pixels: tolerate decoder + fixed-point-resize rounding (a few LSB of
    # uint8, i.e. a few /58 in normalized units) but demand close agreement
    diff = np.abs(got["image"] - ref["image"])
    assert diff.mean() < 0.02, diff.mean()
    assert np.percentile(diff, 99.9) < 0.2
    # padding region identical (zero)
    nh, nw = (int(v) for v in ref["img_shape"])
    assert not got["image"][nh:].any() and not got["image"][:, nw:].any()


def test_native_flip_parity(tmp_path):
    p = str(tmp_path / "img.jpg")
    img = _write_jpeg(p, 200, 320, seed=3)
    cfg = PipelineConfig(scale=(128, 96), flip_prob=1.0, max_gt_boxes=5)
    boxes = np.array([[20.0, 30.0, 100.0, 90.0]], np.float32)
    labels = np.array([1], np.int32)

    ref = preprocess_image(
        img, boxes, labels, cfg, train=True, rng=np.random.RandomState(7)
    )
    got = preprocess_image_file(
        p, boxes, labels, cfg, train=True, rng=np.random.RandomState(7)
    )
    assert ref["flipped"] and got["flipped"]
    np.testing.assert_allclose(got["gt_boxes"], ref["gt_boxes"], atol=1e-4)
    assert np.abs(got["image"] - ref["image"]).mean() < 0.02


def test_non_jpeg_falls_back(tmp_path):
    p = str(tmp_path / "img.png")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 150, 3), np.uint8)
    cv2.imwrite(p, img)
    cfg = PipelineConfig(scale=(128, 96), max_gt_boxes=5)
    out = preprocess_image_file(
        p, np.zeros((0, 4), np.float32), np.zeros(0, np.int32), cfg, train=False
    )
    # PNG is losslessly decoded by the cv2 fallback: exact match with the
    # in-memory reference path
    ref = preprocess_image(
        cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB),
        np.zeros((0, 4), np.float32), np.zeros(0, np.int32), cfg, train=False,
    )
    np.testing.assert_array_equal(out["image"], ref["image"])


def test_grayscale_jpeg(tmp_path):
    p = str(tmp_path / "gray.jpg")
    rng = np.random.RandomState(2)
    gray = cv2.resize(
        rng.randint(0, 255, (20, 30), np.uint8), (240, 160),
        interpolation=cv2.INTER_CUBIC,
    )
    cv2.imwrite(p, gray)
    cfg = PipelineConfig(scale=(128, 96), max_gt_boxes=5)
    out = preprocess_image_file(
        p, np.zeros((0, 4), np.float32), np.zeros(0, np.int32), cfg, train=False
    )
    ref = preprocess_image(
        cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB),
        np.zeros((0, 4), np.float32), np.zeros(0, np.int32), cfg, train=False,
    )
    assert np.abs(out["image"] - ref["image"]).mean() < 0.02

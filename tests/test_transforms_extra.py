import numpy as np

from balancedgroupsoftmax_tpu.data.transforms_extra import (
    expand,
    min_iou_random_crop,
    photo_metric_distortion,
    random_crop,
)


def test_photo_metric_distortion_shape_dtype():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 48, 3), np.uint8)
    out = photo_metric_distortion(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_expand_translates_boxes():
    rng = np.random.RandomState(1)
    img = np.full((20, 30, 3), 50, np.uint8)
    boxes = np.array([[5.0, 5.0, 15.0, 15.0]])
    out, nb = expand(img, boxes, rng, prob=1.0)
    assert out.shape[0] >= 20 and out.shape[1] >= 30
    # box width/height preserved
    np.testing.assert_allclose(nb[:, 2] - nb[:, 0], 10)
    np.testing.assert_allclose(nb[:, 3] - nb[:, 1], 10)
    # box content preserved at the new location
    x1, y1 = int(nb[0, 0]), int(nb[0, 1])
    assert (out[y1 + 2, x1 + 2] == 50).all()


def test_min_iou_random_crop_keeps_box_validity():
    rng = np.random.RandomState(2)
    img = np.zeros((60, 80, 3), np.uint8)
    boxes = np.array([[10.0, 10.0, 30.0, 30.0], [50.0, 40.0, 70.0, 55.0]])
    labels = np.array([1, 2])
    crop, nb, nl = min_iou_random_crop(img, boxes, labels, rng)
    assert len(nb) == len(nl) and len(nb) >= 1
    h, w = crop.shape[:2]
    assert (nb[:, 0] >= 0).all() and (nb[:, 2] <= w).all()
    assert (nb[:, 1] >= 0).all() and (nb[:, 3] <= h).all()


def test_random_crop():
    rng = np.random.RandomState(3)
    img = np.zeros((50, 50, 3), np.uint8)
    boxes = np.array([[0.0, 0.0, 49.0, 49.0], [45.0, 45.0, 49.0, 49.0]])
    labels = np.array([1, 2])
    crop, nb, nl = random_crop(img, boxes, labels, rng, (30, 30))
    assert crop.shape[:2] == (30, 30)
    assert (nb[:, 2] <= 29).all()

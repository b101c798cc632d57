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


def test_albu_wrapper_with_duck_typed_transform():
    from balancedgroupsoftmax_tpu.data.transforms_extra import albu_wrapper

    class FakeHFlip:
        """Albumentations-interface transform: flips image + boxes, drops
        the last box (simulating a transform removing a degenerate box)."""

        def __call__(self, image, bboxes, labels):
            h, w = image.shape[:2]
            out = [(w - x2, y1, w - x1, y2) for x1, y1, x2, y2 in bboxes]
            return dict(image=image[:, ::-1], bboxes=out[:-1], labels=labels[:-1])

    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    boxes = np.array([[0, 0, 2, 2], [1, 0, 3, 1]], np.float32)
    labels = np.array([3, 5], np.int32)
    fn = albu_wrapper(FakeHFlip())
    ni, nb, nl = fn(img, boxes, labels)
    np.testing.assert_array_equal(ni, img[:, ::-1])
    np.testing.assert_allclose(nb, [[2, 0, 4, 2]])
    np.testing.assert_array_equal(nl, [3])


def test_albu_wrapper_min_visible_filters_out_of_frame():
    from balancedgroupsoftmax_tpu.data.transforms_extra import albu_wrapper

    class Shift:
        def __call__(self, image, bboxes, labels):
            out = [(x1 + 90, y1, x2 + 90, y2) for x1, y1, x2, y2 in bboxes]
            return dict(image=image, bboxes=out, labels=labels)

    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[0, 0, 20, 20], [85, 0, 95, 20]], np.float32)
    labels = np.array([1, 2], np.int32)
    ni, nb, nl = albu_wrapper(Shift(), min_visible=0.5)(img, boxes, labels)
    # first box shifted to [90,110] -> 50% visible (kept at thresh), second
    # to [175,185] -> fully out of frame (dropped)
    np.testing.assert_array_equal(nl, [1])


def test_build_albu_clean_error_without_lib():
    import pytest

    from balancedgroupsoftmax_tpu.data.transforms_extra import build_albu

    try:
        import albumentations  # noqa: F401
        pytest.skip("albumentations installed")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="albu_wrapper"):
        build_albu([{"type": "HorizontalFlip", "p": 1.0}])

import numpy as np
import pytest

from balancedgroupsoftmax_tpu.data.corruptions import CORRUPTIONS, corrupt


@pytest.mark.parametrize("name", CORRUPTIONS)
def test_corruption_shapes_and_types(name):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 96, 3), np.uint8)
    for severity in (1, 3, 5):
        out = corrupt(img, name, severity, seed=1)
        assert out.shape == img.shape, name
        assert out.dtype == np.uint8, name
    # severity 0 = identity
    np.testing.assert_array_equal(corrupt(img, name, 0), img)


def test_corruptions_actually_change_image():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    for name in CORRUPTIONS:
        out = corrupt(img, name, 3, seed=2)
        assert np.abs(out.astype(int) - img.astype(int)).mean() > 0.5, name


def test_corruption_severity_monotone_for_noise():
    rng = np.random.RandomState(2)
    img = np.full((64, 64, 3), 128, np.uint8)
    prev = 0.0
    for s in (1, 3, 5):
        out = corrupt(img, "gaussian_noise", s, seed=3)
        dev = np.abs(out.astype(float) - 128).mean()
        assert dev > prev
        prev = dev

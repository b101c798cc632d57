import numpy as np

from balancedgroupsoftmax_tpu.core.anchors import (
    base_anchors,
    grid_anchors,
    multilevel_anchors,
    valid_flags,
)


def test_grid_anchors_reference_example():
    # Pinned to the reference doctest (anchor_generator.py:5-14):
    # AnchorGenerator(9, [1.], [1.]).grid_anchors((2, 2)) with stride 16.
    out = grid_anchors((2, 2), 16, 9, (1.0,), (1.0,))
    expected = np.array(
        [[0.0, 0.0, 8.0, 8.0], [16.0, 0.0, 24.0, 8.0], [0.0, 16.0, 8.0, 24.0], [16.0, 16.0, 24.0, 24.0]]
    )
    np.testing.assert_allclose(out, expected)


def test_base_anchors_rpn_config():
    # RPN config: scales=[8], ratios=[0.5, 1.0, 2.0], stride 4 level.
    out = base_anchors(4, (8.0,), (0.5, 1.0, 2.0))
    assert out.shape == (3, 4)
    # ratio=1.0 anchor is a 32x32 box centered at 1.5
    np.testing.assert_allclose(out[1], [-14.0, -14.0, 17.0, 17.0])
    # widths/heights follow sqrt-ratio scaling, rounded
    w = out[:, 2] - out[:, 0] + 1
    h = out[:, 3] - out[:, 1] + 1
    np.testing.assert_allclose(w * h / (32 * 32), [0.99, 1.0, 0.99], atol=0.05)


def test_multilevel_anchor_counts():
    sizes = [(200, 336), (100, 168), (50, 84), (25, 42), (13, 21)]
    strides = [4, 8, 16, 32, 64]
    anchors = multilevel_anchors(sizes, strides, scales=[8], ratios=[0.5, 1.0, 2.0])
    for a, (h, w) in zip(anchors, sizes):
        assert a.shape == (h * w * 3, 4)
    # anchors are location-major: first 3 rows share a center
    a0 = anchors[0][:3]
    ctr = (a0[:, :2] + a0[:, 2:]) / 2
    assert np.allclose(ctr, ctr[0], atol=0.51)


def test_valid_flags():
    flags = valid_flags((4, 4), (2, 3), num_base_anchors=2)
    assert flags.shape == (32,)
    grid = flags.reshape(4, 4, 2)
    assert grid[:2, :3].all()
    assert not grid[2:].any()
    assert not grid[:, 3:].any()

import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.ops import (
    bbox2delta,
    delta2bbox,
    bbox_overlaps,
    bbox_flip,
    bbox_mapping,
    bbox_mapping_back,
)


def test_delta2bbox_reference_example():
    # Pinned to the reference doctest (mmdet/core/bbox/transforms.py:63-77).
    rois = jnp.array(
        [[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0], [5.0, 5.0, 5.0, 5.0]]
    )
    deltas = jnp.array(
        [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0], [0.0, 0.0, 2.0, -1.0], [0.7, -1.9, -0.5, 0.3]]
    )
    out = delta2bbox(rois, deltas, max_shape=(32, 32))
    expected = np.array(
        [
            [0.0000, 0.0000, 1.0000, 1.0000],
            [0.2817, 0.2817, 4.7183, 4.7183],
            [0.0000, 0.6321, 7.3891, 0.3679],
            [5.8967, 2.9251, 5.5033, 3.2749],
        ]
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_bbox2delta_roundtrip():
    rng = np.random.RandomState(0)
    proposals = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    proposals[:, 2:] += proposals[:, :2] + 1  # ensure x2>x1, y2>y1
    gt = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    gt[:, 2:] += gt[:, :2] + 1
    means = (0.1, -0.1, 0.05, 0.0)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.asarray(proposals), jnp.asarray(gt), means, stds)
    rec = delta2bbox(jnp.asarray(proposals), deltas, means, stds, wh_ratio_clip=1e-6)
    np.testing.assert_allclose(np.asarray(rec), gt, atol=1e-2)


def test_bbox_overlaps_plus_one_convention():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0]])  # area 100 under +1
    b = jnp.array([[0.0, 0.0, 9.0, 9.0], [5.0, 5.0, 14.0, 14.0], [20.0, 20.0, 29.0, 29.0]])
    ious = np.asarray(bbox_overlaps(a, b))
    # intersection with b[1] is 5x5=25 -> iou 25/175
    np.testing.assert_allclose(ious[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


def test_bbox_overlaps_iof_and_aligned():
    a = jnp.array([[0.0, 0.0, 9.0, 9.0], [0.0, 0.0, 4.0, 4.0]])
    b = jnp.array([[0.0, 0.0, 4.0, 4.0], [0.0, 0.0, 9.0, 9.0]])
    iof = np.asarray(bbox_overlaps(a, b, mode="iof"))
    np.testing.assert_allclose(iof[0, 0], 25.0 / 100.0, atol=1e-6)
    aligned = np.asarray(bbox_overlaps(a, b, is_aligned=True))
    np.testing.assert_allclose(aligned, [0.25, 0.25], atol=1e-6)


def test_bbox_overlaps_batched():
    rng = np.random.RandomState(1)
    b1 = rng.uniform(0, 50, (2, 8, 4)).astype(np.float32)
    b1[..., 2:] += b1[..., :2]
    b2 = rng.uniform(0, 50, (2, 6, 4)).astype(np.float32)
    b2[..., 2:] += b2[..., :2]
    out = bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2))
    assert out.shape == (2, 8, 6)
    single = bbox_overlaps(jnp.asarray(b1[1]), jnp.asarray(b2[1]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), atol=1e-6)


def test_bbox_flip_involution_and_mapping():
    boxes = jnp.array([[10.0, 5.0, 30.0, 25.0], [0.0, 0.0, 99.0, 49.0]])
    img_shape = (50, 100)
    flipped = bbox_flip(boxes, img_shape)
    np.testing.assert_allclose(np.asarray(flipped[0]), [100 - 31, 5, 100 - 11, 25])
    np.testing.assert_allclose(np.asarray(bbox_flip(flipped, img_shape)), np.asarray(boxes))
    mapped = bbox_mapping(boxes, img_shape, 2.0, True)
    back = bbox_mapping_back(mapped, img_shape, 2.0, True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-5)

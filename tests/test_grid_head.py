import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.models.grid_head import (
    GridHead,
    grid_targets,
    grid_to_boxes,
)


def test_grid_head_shapes():
    m = GridHead(num_convs=2, conv_channels=32, heatmap_size=56)
    x = jnp.zeros((3, 14, 14, 64))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (3, 56, 56, 9)


def test_grid_targets_and_decode_roundtrip():
    rois = jnp.asarray([[10.0, 10.0, 65.0, 65.0]])
    gts = jnp.asarray([[20.0, 15.0, 50.0, 60.0]])
    heat, valid = grid_targets(rois, gts, heatmap_size=56)
    assert heat.shape == (1, 56, 56, 9)
    assert bool(np.asarray(valid).all())
    # decoding the *targets* should recover the gt box within a heatmap cell
    boxes = grid_to_boxes(jnp.where(heat > 0, 10.0, -10.0), rois)
    cell = 56.0 / 56  # one heatmap cell in roi units
    np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(gts[0]), atol=1.5)


def test_grid_points_outside_roi_invalid():
    rois = jnp.asarray([[10.0, 10.0, 40.0, 40.0]])
    gts = jnp.asarray([[5.0, 5.0, 60.0, 60.0]])  # gt larger than roi
    _, valid = grid_targets(rois, gts)
    v = np.asarray(valid[0])
    assert not v[0]  # top-left corner point falls outside the roi
    assert v[4]  # center point inside

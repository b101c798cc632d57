import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.ops.roi_align import (
    map_roi_levels,
    multilevel_roi_align,
    roi_align,
)


def np_roi_align(feat, rois, spatial_scale, out_size, sample_num):
    """Independent numpy mirror of roi_align_kernel.cu semantics."""
    h, w, c = feat.shape
    r = rois.shape[0]
    out = np.zeros((r, out_size, out_size, c), np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low, x_low = int(y), int(x)
        if y_low >= h - 1:
            y_high = y_low = h - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= w - 1:
            x_high = x_low = w - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1 - ly, 1 - lx
        return (
            hy * hx * feat[y_low, x_low]
            + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low]
            + ly * lx * feat[y_high, x_high]
        )

    for n in range(r):
        x1, y1, x2, y2 = rois[n]
        start_w, start_h = x1 * spatial_scale, y1 * spatial_scale
        end_w, end_h = (x2 + 1) * spatial_scale, (y2 + 1) * spatial_scale
        roi_w = max(end_w - start_w, 0.0)
        roi_h = max(end_h - start_h, 0.0)
        bin_w, bin_h = roi_w / out_size, roi_h / out_size
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(c)
                for iy in range(sample_num):
                    y = start_h + ph * bin_h + (iy + 0.5) * bin_h / sample_num
                    for ix in range(sample_num):
                        x = start_w + pw * bin_w + (ix + 0.5) * bin_w / sample_num
                        acc += bilinear(y, x)
                out[n, ph, pw] = acc / (sample_num**2)
    return out


def test_roi_align_matches_numpy_mirror():
    rng = np.random.RandomState(0)
    feat = rng.randn(24, 32, 3).astype(np.float32)
    rois = np.array(
        [
            [0, 0, 63, 47],  # full image at stride 2
            [10, 8, 40, 30],
            [5.5, 3.25, 20.75, 18.5],  # fractional
            [60, 44, 70, 50],  # partially outside
            [2, 2, 2, 2],  # tiny
        ],
        np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.5, 7, 2))
    expected = np_roi_align(feat, rois, 0.5, 7, 2)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_roi_align_constant_map():
    feat = np.full((16, 16, 4), 3.5, np.float32)
    rois = np.array([[2, 2, 10, 10]], np.float32)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0, 7, 2))
    np.testing.assert_allclose(out, 3.5, rtol=1e-6)


def test_roi_align_gradient_flows():
    import jax

    feat = jnp.ones((8, 8, 2))
    rois = jnp.asarray([[1.0, 1.0, 5.0, 5.0]])

    def f(x):
        return roi_align(x, rois, 1.0, 2, 2).sum()

    g = jax.grad(f)(feat)
    # gradient mass == number of output elements (mean of bilinear weights sums to 1)
    np.testing.assert_allclose(float(g.sum()), 2 * 2 * 2, rtol=1e-5)
    assert float(jnp.abs(g).max()) > 0


def test_map_roi_levels():
    rois = jnp.asarray(
        [
            [0, 0, 20, 20],  # scale 21 -> lvl 0
            [0, 0, 111, 111],  # scale 112 = 56*2 -> log2(2)=1 -> lvl 1
            [0, 0, 223, 223],  # scale 224 -> lvl 2
            [0, 0, 447, 447],  # scale 448 -> lvl 3
            [0, 0, 1000, 1000],  # clamped to 3
        ],
        jnp.float32,
    )
    lvls = np.asarray(map_roi_levels(rois, 4))
    np.testing.assert_array_equal(lvls, [0, 1, 2, 3, 3])


def test_multilevel_roi_align_selects_right_level():
    rng = np.random.RandomState(1)
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(rng.randn(64 // (s // 4), 64 // (s // 4), 2).astype(np.float32)) for s in strides]
    rois = jnp.asarray([[0, 0, 20, 20], [0, 0, 111, 111]], jnp.float32)
    out = multilevel_roi_align(feats, rois, strides, out_size=3, sample_num=2)
    # roi 0 -> level 0, roi 1 -> level 1
    exp0 = roi_align(feats[0], rois[:1], 1 / 4, 3, 2)
    exp1 = roi_align(feats[1], rois[1:], 1 / 8, 3, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(exp0[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(exp1[0]), rtol=1e-5)

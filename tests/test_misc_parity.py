import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.data.pipeline import sample_out_head_images
from balancedgroupsoftmax_tpu.models.dual_head import (
    tail_class_mask_from_counts,
    update_scores_with_reweight,
)
from balancedgroupsoftmax_tpu.ops.deform_conv import deform_roi_pool
from balancedgroupsoftmax_tpu.ops.roi_align import roi_align


def test_deform_roi_pool_zero_offsets_equals_roi_align():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(24, 32, 3).astype(np.float32))
    rois = jnp.asarray([[4.0, 4.0, 40.0, 30.0], [10.0, 2.0, 60.0, 44.0]])
    off = jnp.zeros((2, 7, 7, 2))
    got = deform_roi_pool(feat, rois, off, 0.5, 7, 2)
    ref = roi_align(feat, rois, 0.5, 7, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_deform_roi_pool_offsets_shift_sampling():
    feat = np.zeros((16, 16, 1), np.float32)
    feat[:, 8:] = 1.0  # right half ones
    rois = jnp.asarray([[0.0, 0.0, 7.0, 7.0]])
    # shift all bins right by gamma * roi_w * 10 = 0.1*8*10 = 8 cells
    off = jnp.zeros((1, 2, 2, 2)).at[..., 1].set(10.0)
    out = deform_roi_pool(jnp.asarray(feat), rois, off, 1.0, 2, 2, gamma=0.1)
    np.testing.assert_allclose(np.asarray(out).mean(), 1.0, atol=1e-5)


def _torch_semantics_reference(main, back, mask):
    """Numpy emulation of test_mixins.py:70-92 (per-RoI row replacement)."""
    out = main.copy()
    cls_ori = main.argmax(1)
    cls_back = back.argmax(1)
    cls_ori = np.where(cls_ori == 0, cls_ori, cls_back)
    replace = mask[cls_ori]
    out[replace] = back[replace]
    return out


def test_dual_head_override():
    counts = np.array([0, 5, 500, 50])
    mask = tail_class_mask_from_counts(counts, threshold=100)
    np.testing.assert_array_equal(mask, [False, True, False, True])
    rng = np.random.RandomState(3)
    main = rng.rand(64, 4).astype(np.float32)
    back = rng.rand(64, 4).astype(np.float32)
    got = np.asarray(
        update_scores_with_reweight(
            jnp.asarray(main), jnp.asarray(back), jnp.asarray(mask)
        )
    )
    want = _torch_semantics_reference(main, back, mask)
    np.testing.assert_allclose(got, want)
    # rows whose main argmax is background are never replaced
    bg_row = np.zeros((1, 4), np.float32)
    bg_row[0, 0] = 1.0
    tail_back = np.zeros((1, 4), np.float32)
    tail_back[0, 1] = 1.0  # back head says tail class
    out = np.asarray(
        update_scores_with_reweight(
            jnp.asarray(bg_row), jnp.asarray(tail_back), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(out, bg_row)


def test_sample_out_head_images():
    # 10 head-only images (repeat 1), 3 tail images (repeat 2)
    repeat = np.array([1.0] * 10 + [2.0] * 3)
    labels = [np.array([1])] * 10 + [np.array([2])] * 3
    idx = sample_out_head_images(repeat, labels, head_image_budget=4, epoch_seed=0)
    head_kept = {i for i in idx if i < 10}
    assert len(head_kept) == 4
    for i in (10, 11, 12):  # tail images appear with their repeat factor
        assert (idx == i).sum() == 2

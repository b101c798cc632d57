import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.ops.roi_align import (
    multilevel_roi_align,
    multilevel_roi_align_reference,
)


def test_fused_matches_reference_formulation():
    rng = np.random.RandomState(0)
    strides = [4, 8, 16, 32]
    H, W = 64, 96
    feats = [
        jnp.asarray(rng.randn(H // (s // 4), W // (s // 4), 8).astype(np.float32))
        for s in strides
    ]
    # rois spanning all levels + degenerate + partially outside
    rois = jnp.asarray(
        [
            [0, 0, 20, 20],
            [3.5, 7.25, 60.75, 50.5],
            [0, 0, 111, 111],
            [0, 0, 250, 250],
            [10, 10, 400, 380],
            [2, 2, 2, 2],
            [250, 250, 400, 400],  # fully outside finest map at its level
        ],
        jnp.float32,
    )
    ref = multilevel_roi_align_reference(feats, rois, strides, 7, 2)
    fused = multilevel_roi_align(feats, rois, strides, 7, 2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_random_rois_large():
    rng = np.random.RandomState(1)
    strides = [4, 8, 16, 32]
    feats = [
        jnp.asarray(rng.randn(200 // (s // 4), 336 // (s // 4), 4).astype(np.float32))
        for s in strides
    ]
    ctr = rng.uniform(0, 700, (64, 2))
    wh = rng.uniform(4, 600, (64, 2))
    rois_np = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    rois = jnp.asarray(rois_np)
    ref = multilevel_roi_align_reference(feats, rois, strides, 7, 2)
    fused = multilevel_roi_align(feats, rois, strides, 7, 2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_fused_gradients_match():
    import jax

    rng = np.random.RandomState(2)
    strides = [4, 8]
    feats = [
        jnp.asarray(rng.randn(16 // (s // 4), 16 // (s // 4), 3).astype(np.float32))
        for s in strides
    ]
    rois = jnp.asarray([[1, 1, 30, 30], [4, 4, 60, 60]], jnp.float32)

    def loss_ref(fs):
        return (multilevel_roi_align_reference(fs, rois, strides, 3, 2) ** 2).sum()

    def loss_fused(fs):
        return (multilevel_roi_align(fs, rois, strides, 3, 2) ** 2).sum()

    g_ref = jax.grad(loss_ref)(feats)
    g_fused = jax.grad(loss_fused)(feats)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)

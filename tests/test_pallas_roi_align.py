import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.ops.roi_align import multilevel_roi_align
from balancedgroupsoftmax_tpu.pallas.roi_align import multilevel_roi_align_pallas


def make_case(seed=0, B=2, R=12, C=8, max_aspect=5.0):
    rng = np.random.RandomState(seed)
    strides = [4, 8, 16, 32]
    feats = tuple(
        jnp.asarray(rng.randn(B, 256 // (s // 4), 320 // (s // 4), C).astype(np.float32))
        for s in strides
    )
    ctr = rng.uniform(50, 900, (B, R, 2))
    scale = rng.uniform(10, 350, (B, R))
    aspect = rng.uniform(1.0 / max_aspect, max_aspect, (B, R))
    w = scale * np.sqrt(aspect)
    h = scale / np.sqrt(aspect)
    wh = np.stack([w, h], -1)
    rois = jnp.asarray(
        np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    )
    return feats, rois, strides


def test_pallas_roi_align_matches_xla():
    feats, rois, strides = make_case()
    ref = jax.vmap(
        lambda per_img, rr: multilevel_roi_align(per_img, rr, strides, 7, 2)
    )(feats, rois)
    got = multilevel_roi_align_pallas(
        feats, rois, tuple(strides), 7, 2, 56, True  # interpret mode
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_mask_size():
    feats, rois, strides = make_case(seed=1, R=6)
    ref = jax.vmap(
        lambda per_img, rr: multilevel_roi_align(per_img, rr, strides, 14, 2)
    )(feats, rois)
    got = multilevel_roi_align_pallas(feats, rois, tuple(strides), 14, 2, 56, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_roi_align_ultra_thin_clamps_gracefully():
    # aspect 50 rois exceed the window on their long axis: outer samples
    # clamp to the window edge (documented deviation) — output must stay
    # finite and match the reference on the in-window interior.
    feats, _, strides = make_case(seed=3, R=2)
    rois = jnp.asarray([[[100.0, 200.0, 500.0, 208.0], [300.0, 50.0, 308.0, 450.0]]])
    feats1 = tuple(f[:1] for f in feats)
    got = multilevel_roi_align_pallas(feats1, rois, tuple(strides), 7, 2, 56, True)
    assert np.isfinite(np.asarray(got)).all()
    ref = jax.vmap(
        lambda per_img, rr: multilevel_roi_align(per_img, rr, strides, 7, 2)
    )(feats1, rois)
    # central columns sample inside the window and agree exactly
    np.testing.assert_allclose(
        np.asarray(got)[0, :, 2:5, 2:5], np.asarray(ref)[0, :, 2:5, 2:5],
        rtol=1e-4, atol=1e-4,
    )


def test_pallas_roi_align_gradient_via_reference_bwd():
    feats, rois, strides = make_case(seed=2, R=4, C=4)

    def loss_p(fs):
        return (
            multilevel_roi_align_pallas(fs, rois, tuple(strides), 7, 2, 56, True) ** 2
        ).sum()

    def loss_r(fs):
        return (
            jax.vmap(
                lambda per_img, rr: multilevel_roi_align(per_img, rr, strides, 7, 2)
            )(fs, rois)
            ** 2
        ).sum()

    gp = jax.grad(loss_p)(feats)
    gr = jax.grad(loss_r)(feats)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_precomputed_interp_matches_in_kernel():
    """PRECOMPUTED_INTERP streams XLA-built interp matrices into the kernel
    instead of building them per-roi on the VPU — same f32 formula, but
    batched shapes fuse differently, so equality is to float tolerance."""
    from balancedgroupsoftmax_tpu.pallas import roi_align as ra

    feats, rois, strides = make_case(seed=3)
    ref = np.asarray(ra._forward(feats, rois, tuple(strides), 7, 2, 56, True))
    ra.PRECOMPUTED_INTERP = True
    try:
        got = np.asarray(ra._forward(feats, rois, tuple(strides), 7, 2, 56, True))
    finally:
        ra.PRECOMPUTED_INTERP = False
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=5e-5)


def test_scatter_backward_matches_scan_backward():
    """BWD_SCATTER accumulates the same per-roi window gradients through
    jax.lax.scatter_add instead of the sequential half-canvas scan; only
    the addition ORDER differs (scatter collision order vs roi order)."""
    from balancedgroupsoftmax_tpu.pallas import roi_align as ra

    feats, rois, strides = make_case(seed=4, R=16, C=8)
    g = jnp.asarray(
        np.random.RandomState(5).randn(rois.shape[0], rois.shape[1], 7, 7, 8),
        jnp.float32,
    )
    args = (tuple(strides), 7, 2, 56, False)
    ref = ra._bwd(*args, (feats, rois), g)[0]
    ra.BWD_SCATTER = True
    try:
        got = ra._bwd(*args, (feats, rois), g)[0]
    finally:
        ra.BWD_SCATTER = False
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )

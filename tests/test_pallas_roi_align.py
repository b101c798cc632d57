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
    """precomputed_interp streams XLA-built interp matrices into the kernel
    instead of building them per-roi on the VPU — same f32 formula, but
    batched shapes fuse differently, so equality is to float tolerance."""
    from balancedgroupsoftmax_tpu.pallas import roi_align as ra

    feats, rois, strides = make_case(seed=3)
    ref = np.asarray(
        ra._forward(feats, rois, tuple(strides), 7, 2, 56, True, False)
    )
    got = np.asarray(
        ra._forward(feats, rois, tuple(strides), 7, 2, 56, True, True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=5e-5)


def _bwd_case(seed=4, R=16, C=8, out_size=7):
    feats, rois, strides = make_case(seed=seed, R=R, C=C)
    g = jnp.asarray(
        np.random.RandomState(seed + 1).randn(
            rois.shape[0], rois.shape[1], out_size, out_size, C
        ),
        jnp.float32,
    )
    return feats, rois, tuple(strides), g


def test_scatter_backward_matches_scan_backward():
    """bwd_mode="scatter" accumulates the same per-roi window gradients
    through jax.lax.scatter_add instead of the sequential half-canvas scan;
    only the addition ORDER differs (scatter collision order vs roi
    order)."""
    from balancedgroupsoftmax_tpu.pallas import roi_align as ra

    feats, rois, strides, g = _bwd_case()
    ref = ra._bwd(strides, 7, 2, 56, False, "scan", None, (feats, rois), g)[0]
    got = ra._bwd(strides, 7, 2, 56, False, "scatter", None, (feats, rois), g)[0]
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_scatter_backward_pads_odd_roi_counts():
    """An odd roi count must pad up to the chunk, not degrade to chunk=1
    (zero-gradient pad rois are scatter_add no-ops)."""
    from balancedgroupsoftmax_tpu.pallas import roi_align as ra

    feats, rois, strides, g = _bwd_case(seed=6, R=13)  # 2*13=26 rois
    ref = ra._bwd(strides, 7, 2, 56, False, "scan", None, (feats, rois), g)[0]
    got = ra._bwd(strides, 7, 2, 56, False, "scatter", None, (feats, rois), g)[0]
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_dense_backward_matches_scan_backward():
    """bwd_mode="dense" deposits each roi's gradient via global-coordinate
    interp matmuls (dL = sum_r wy_r^T g_r wx_r) instead of windowed
    read-modify-write — same CUDA weights/boundary rules, different
    summation order, so equality is to float tolerance. Covers both head
    (7) and mask (14) output sizes."""
    from balancedgroupsoftmax_tpu.pallas import roi_align as ra

    for out_size in (7, 14):
        feats, rois, strides, g = _bwd_case(seed=7, R=16, out_size=out_size)
        ref = ra._bwd(
            strides, out_size, 2, 56, False, "scan", None, (feats, rois), g
        )[0]
        for mode in ("dense", "dense2"):
            got = ra._bwd(
                strides, out_size, 2, 56, False, mode, None, (feats, rois), g
            )[0]
            for a, b in zip(got, ref):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
                )


def test_dense_backward_bf16_pyramid():
    """The production train path feeds bf16 pyramids; the dense backward
    must produce finite bf16 gradients close to the f32 scan result."""
    from balancedgroupsoftmax_tpu.pallas import roi_align as ra

    feats, rois, strides, g = _bwd_case(seed=8, R=12)
    ref = ra._bwd(strides, 7, 2, 56, False, "scan", None, (feats, rois), g)[0]
    bf = tuple(f.astype(jnp.bfloat16) for f in feats)
    got = ra._bwd(
        strides, 7, 2, 56, False, "dense", None, (bf, rois), g
    )[0]
    for a, b in zip(got, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.isfinite(a).all()
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2)

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.ops.deform_conv import DeformConv, deform_conv2d


def test_zero_offset_equals_regular_conv():
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(10, 12, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32) * 0.2
    offsets = np.zeros((10, 12, 18), np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w))
    )
    ref = F.conv2d(
        torch.from_numpy(np.transpose(x, (2, 0, 1))[None]),
        torch.from_numpy(np.transpose(w, (3, 2, 0, 1))),
        padding=1,
    ).numpy()[0]
    np.testing.assert_allclose(got, np.transpose(ref, (1, 2, 0)), atol=1e-4)


def test_integer_offset_equals_shifted_input():
    rng = np.random.RandomState(1)
    x = rng.randn(9, 9, 2).astype(np.float32)
    # 1x1 "kernel" expressed as 3x3 with only center tap nonzero
    w = np.zeros((3, 3, 2, 2), np.float32)
    w[1, 1] = np.eye(2)
    # shift every sample by (0, +1): output(y,x) = input(y, x+1)
    offsets = np.zeros((9, 9, 18), np.float32)
    offsets[..., 2 * 4 + 1] = 1.0  # tap 4 = center; dx = +1
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w))
    )
    np.testing.assert_allclose(got[:, :-1], x[:, 1:], atol=1e-5)
    np.testing.assert_allclose(got[:, -1], 0.0, atol=1e-6)  # out of bounds


def test_fractional_offset_bilinear():
    x = np.zeros((5, 5, 1), np.float32)
    x[2, 2, 0] = 4.0
    w = np.zeros((3, 3, 1, 1), np.float32)
    w[1, 1] = 1.0
    offsets = np.zeros((5, 5, 18), np.float32)
    offsets[..., 2 * 4] = 0.5  # dy = +0.5 on the center tap
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w)))
    # output at (1,2) samples (1.5, 2) -> bilinear of x[1,2]=0 and x[2,2]=4 -> 2
    np.testing.assert_allclose(got[1, 2, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(got[2, 2, 0], 2.0, atol=1e-5)  # samples (2.5, 2)


def test_modulation_mask_scales():
    rng = np.random.RandomState(2)
    x = rng.randn(6, 6, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 3).astype(np.float32)
    offsets = np.zeros((6, 6, 18), np.float32)
    full = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w),
        mask=jnp.ones((6, 6, 9)),
    )
    half = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w),
        mask=jnp.full((6, 6, 9), 0.5),
    )
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5, atol=1e-5)


def test_deform_conv_module_init_as_plain_conv():
    """Zero-initialized offsets: DCN == plain conv with the same kernel."""
    model = DeformConv(features=4, modulated=True)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 8, 8, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 8, 8, 4)

    import flax.linen as nn

    ref_conv = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    ref = ref_conv.apply(
        {"params": {"kernel": variables["params"]["kernel"]}}, x
    )
    # v2 modulation at init: sigmoid(0) = 0.5 gate on every tap
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref) * 0.5, atol=1e-4)


def test_resnet_dcn_stages():
    from balancedgroupsoftmax_tpu.models.resnet import ResNet

    model = ResNet(depth=50, dcn_stages=(False, False, True, True))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    p = variables["params"]
    assert "conv_offset" not in p["layer2_block0"]["conv2"]
    assert "conv_offset" in p["layer3_block0"]["conv2"]
    assert "conv_offset" in p["layer4_block2"]["conv2"]
    outs = model.apply(variables, x)
    assert len(outs) == 4


def test_grouped_zero_offset_equals_grouped_conv():
    """groups>1 parity: the X101 DCN keeps conv2 grouped
    (resnext.py:74-83 passes groups into the deform conv;
    gs_htc_dconv_c3-c5_*.py dcn=dict(groups=64))."""
    import flax.linen as nn

    rng = np.random.RandomState(4)
    g, cg, co = 4, 3, 8  # C_in = 12, 2 out channels per group
    x = rng.randn(10, 12, g * cg).astype(np.float32)
    w = (rng.randn(3, 3, cg, co) * 0.2).astype(np.float32)
    offsets = np.zeros((10, 12, 18), np.float32)
    got = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w), groups=g
        )
    )
    ref_conv = nn.Conv(
        co, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
        feature_group_count=g,
    )
    ref = ref_conv.apply({"params": {"kernel": jnp.asarray(w)}}, x[None])[0]
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-4)


def test_grouped_fractional_offset_matches_dense_blockdiag():
    """Fractional offsets through the grouped path == the dense path with a
    block-diagonal kernel (same math, 1/G the FLOPs)."""
    rng = np.random.RandomState(5)
    g, cg, co = 2, 2, 4
    c_in = g * cg
    x = rng.randn(7, 9, c_in).astype(np.float32)
    w = (rng.randn(3, 3, cg, co) * 0.3).astype(np.float32)
    offsets = (rng.randn(7, 9, 18) * 0.7).astype(np.float32)
    got = np.asarray(
        deform_conv2d(
            jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(w), groups=g
        )
    )
    # dense block-diagonal equivalent: group g's input slice feeds only its
    # output slice
    og = co // g
    wd = np.zeros((3, 3, c_in, co), np.float32)
    for i in range(g):
        wd[:, :, i * cg : (i + 1) * cg, i * og : (i + 1) * og] = w[
            :, :, :, i * og : (i + 1) * og
        ]
    ref = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(wd))
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_dcn_x101_block_is_v1_grouped():
    """The top-line config's DCN block: v1 (18 offset channels, no mask)
    with the grouped kernel shape (gs_htc_dconv config parity)."""
    from balancedgroupsoftmax_tpu.models.resnet import Bottleneck

    block = Bottleneck(planes=128, groups=4, base_width=4, use_dcn=True)
    width = int(128 * (4 / 64.0)) * 4  # ResNeXt width rule
    x = jnp.zeros((1, 16, 16, 64))
    variables = block.init(jax.random.PRNGKey(0), x)
    p = variables["params"]
    off_kernel = p["conv2"]["conv_offset"]["kernel"]
    assert off_kernel.shape[-1] == 18  # v1: 2*3*3, no modulation channels
    assert p["conv2"]["kernel"].shape == (3, 3, width // 4, width)
    out = block.apply(variables, x)
    assert out.shape == (1, 16, 16, 512)


def test_bilinear_matches_cuda_oracle_on_boundaries():
    """Dense sweep of sample positions across and BEYOND the image border
    against a numpy oracle of deformable_im2col_bilinear
    (deform_conv_cuda_kernel.cu:84-113). Round-5 regression: deriving the
    high corner from the already-clipped low corner put samples with a
    coordinate in (-1, 0) on row/col 1 instead of 0."""
    from balancedgroupsoftmax_tpu.ops.deform_conv import _bilinear_hw

    def oracle(im, y, x):
        H, W = im.shape[:2]
        if not (y > -1 and x > -1 and y < H and x < W):
            return np.zeros(im.shape[-1])
        hl, wl = int(np.floor(y)), int(np.floor(x))
        hh_, wh_ = hl + 1, wl + 1
        lh, lw = y - hl, x - wl
        hh, hw = 1 - lh, 1 - lw
        v = np.zeros(im.shape[-1])
        if hl >= 0 and wl >= 0:
            v = v + hh * hw * im[hl, wl]
        if hl >= 0 and wh_ <= W - 1:
            v = v + hh * lw * im[hl, wh_]
        if hh_ <= H - 1 and wl >= 0:
            v = v + lh * hw * im[hh_, wl]
        if hh_ <= H - 1 and wh_ <= W - 1:
            v = v + lh * lw * im[hh_, wh_]
        return v

    rng = np.random.RandomState(0)
    im = rng.randn(5, 5, 2).astype(np.float32)
    grid = np.linspace(-1.4, 5.4, 35)
    Y, X = np.meshgrid(grid, grid, indexing="ij")
    got = np.asarray(
        _bilinear_hw(jnp.asarray(im), jnp.asarray(Y.ravel()), jnp.asarray(X.ravel()))
    )
    ref = np.stack(
        [oracle(im, float(y), float(x)) for y, x in zip(Y.ravel(), X.ravel())]
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_shift_window_matches_gather_within_window():
    """The gather-free shift-decomposition cols (shift_window=D) must match
    the exact bilinear-gather path — values AND input/offset gradients —
    whenever |offset| <= D, including samples pushed off the image edge
    and the strided (first-block) layout."""
    rng = np.random.RandomState(7)
    for stride, h, w, c, d in [(1, 13, 11, 8, 2), (2, 13, 11, 8, 3)]:
        ho = (h + 2 - 3) // stride + 1
        wo = (w + 2 - 3) // stride + 1
        x = jnp.asarray(rng.randn(h, w, c), jnp.float32)
        off = jnp.asarray(rng.uniform(-d, d, (ho, wo, 18)), jnp.float32)
        wgt = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
        a = deform_conv2d(x, off, wgt, None, stride, 1, 1, 0)
        b = deform_conv2d(x, off, wgt, None, stride, 1, 1, d)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
        g0 = jax.grad(
            lambda x_, o_: jnp.sum(
                jnp.sin(deform_conv2d(x_, o_, wgt, None, stride, 1, 1, 0))
            ),
            argnums=(0, 1),
        )(x, off)
        g1 = jax.grad(
            lambda x_, o_: jnp.sum(
                jnp.sin(deform_conv2d(x_, o_, wgt, None, stride, 1, 1, d))
            ),
            argnums=(0, 1),
        )(x, off)
        for u, v in zip(g0, g1):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v), atol=1e-4)


def test_shift_window_clamps_large_offsets():
    """Offsets beyond the window clamp to +-window cells: the result must
    equal the gather path evaluated at the clamped offsets."""
    rng = np.random.RandomState(8)
    h = w = 11
    x = jnp.asarray(rng.randn(h, w, 4), jnp.float32)
    off = jnp.asarray(rng.uniform(-6.0, 6.0, (h, w, 18)), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, 4, 4) * 0.1, jnp.float32)
    d = 2
    got = deform_conv2d(x, off, wgt, None, 1, 1, 1, d)
    ref = deform_conv2d(x, jnp.clip(off, -d, d), wgt, None, 1, 1, 1, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)

"""Fused Pallas deform-conv kernel vs the XLA shift-decomposition path.

The kernel (pallas/deform_conv.py) must equal ops/deform_conv.py
deform_conv2d(shift_window=D) — the bilinear gather evaluated at
clip(offsets, +-D) — in values, and its custom_vjp must route gradients
through the dense XLA backward. Runs in interpreter mode on the CPU
test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balancedgroupsoftmax_tpu.pallas import deform_conv as pdc


@pytest.mark.parametrize(
    "stride,b,h,w,c,cout,groups",
    [(1, 2, 10, 9, 8, 8, 1), (2, 1, 11, 10, 16, 16, 4)],
)
def test_fused_matches_xla_shift_path(stride, b, h, w, c, cout, groups):
    d = 2
    rng = np.random.RandomState(3)
    ho = (h + 2 - 3) // stride + 1
    wo = (w + 2 - 3) // stride + 1
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    # beyond-window offsets exercise the clamp semantics too
    off = jnp.asarray(rng.uniform(-4, 4, (b, ho, wo, 18)), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c // groups, cout) * 0.1, jnp.float32)
    got = pdc.deform_conv2d_fused(x, off, wgt, None, stride, 1, groups, d, True)
    ref = pdc._xla_reference(x, off, wgt, None, stride, 1, groups, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_modulated_mask():
    """v2 modulation folds into the interpolation weights."""
    rng = np.random.RandomState(4)
    b, h, w, c = 1, 8, 7, 8
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    off = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 18)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9)), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    got = pdc.deform_conv2d_fused(x, off, wgt, mask, 1, 1, 1, 2, True)
    ref = pdc._xla_reference(x, off, wgt, mask, 1, 1, 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_fused_vjp_matches_xla_grads():
    """The custom_vjp backward (dense XLA shift path — pads, no scatter)
    must produce the same input/offset/weight grads as differentiating
    the XLA path directly."""
    rng = np.random.RandomState(5)
    b, h, w, c = 1, 9, 8, 8
    d = 2
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    off = jnp.asarray(rng.uniform(-3, 3, (b, h, w, 18)), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)

    def lf(fn):
        return lambda x_, o_, w_: jnp.sum(jnp.sin(fn(x_, o_, w_)))

    g = jax.grad(
        lf(lambda x_, o_, w_: pdc.deform_conv2d_fused(
            x_, o_, w_, None, 1, 1, 1, d, True
        )),
        argnums=(0, 1, 2),
    )(x, off, wgt)
    gr = jax.grad(
        lf(lambda x_, o_, w_: pdc._xla_reference(x_, o_, w_, None, 1, 1, 1, d)),
        argnums=(0, 1, 2),
    )(x, off, wgt)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_fused_group_aligned_chunk_diagonal():
    """C_in=256/groups=16 drives the chunk-diagonal GEMM path (n_cc=2,
    each chunk contracting only its own groups' diagonal block) — must
    equal the XLA shift path exactly like the dense-weight path does."""
    rng = np.random.RandomState(6)
    b, h, w, c, groups, d = 1, 9, 8, 256, 16, 2
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    off = jnp.asarray(rng.uniform(-3, 3, (b, h, w, 18)), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c // groups, c) * 0.1, jnp.float32)
    got = pdc.deform_conv2d_fused(x, off, wgt, None, 1, 1, groups, d, True)
    ref = pdc._xla_reference(x, off, wgt, None, 1, 1, groups, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

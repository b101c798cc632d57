"""Fused bottleneck-block kernel vs the flax/XLA Bottleneck (interpret mode).

The kernel (pallas/fused_block.py) replaces the XLA conv-by-conv bottleneck
on the bf16 inference path; these tests pin its numerics to the standard
module — BN folding, conv2 zero-padding semantics at both image edges, the
downsample variant, channel padding for sub-128 inputs, and multi-block
chaining through the row-padded convention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balancedgroupsoftmax_tpu.models.resnet import Bottleneck
from balancedgroupsoftmax_tpu.pallas.fused_block import (
    fold_bottleneck,
    fused_bottleneck,
    pad_rows,
    unpad_rows,
)


def make_block(cin, planes, h, w, seed=0):
    rng = np.random.RandomState(seed)
    m = Bottleneck(planes=planes, stride=1, dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    v = m.init(jax.random.PRNGKey(seed), x)
    # non-trivial BN stats so the fold actually changes the weights
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype),
        v["batch_stats"],
    )
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape) * 0.1, a.dtype), v["params"]
    )
    return m, {"params": params, "batch_stats": stats}, x


@pytest.mark.parametrize(
    "cin,planes", [(64, 32), (128, 16), (96, 64)]
)
def test_fused_block_with_downsample(cin, planes):
    m, v, x = make_block(cin, planes, h=20, w=24, seed=cin)
    ref = m.apply(v, x)
    fp = fold_bottleneck(v["params"], v["batch_stats"])
    assert fp.wd is not None
    out = unpad_rows(fused_bottleneck(pad_rows(x), fp, interpret=True))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
    )


def test_fused_block_identity_residual():
    # Cin == planes*4: no downsample branch
    m, v, x = make_block(64, 16, h=16, w=16, seed=3)
    ref = m.apply(v, x)
    fp = fold_bottleneck(v["params"], v["batch_stats"])
    assert fp.wd is None
    out = unpad_rows(fused_bottleneck(pad_rows(x), fp, interpret=True))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
    )


def test_fused_block_edge_rows_zero_padded():
    """conv2's top/bottom zero padding must come out exactly — the halo
    rows of the row-padded input are filled with garbage to prove the
    kernel never reads them into the math."""
    m, v, x = make_block(64, 16, h=8, w=16, seed=5)
    ref = m.apply(v, x)
    fp = fold_bottleneck(v["params"], v["batch_stats"])
    xp = pad_rows(x)
    xp = xp.at[:, 0].set(1e9).at[:, -1].set(-1e9)
    out = unpad_rows(fused_bottleneck(xp, fp, interpret=True))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
    )


def _make_chain(cins, planes, h, w, seed0=20):
    ms, vs, fps = [], [], []
    from balancedgroupsoftmax_tpu.pallas.fused_block import fold_bottleneck

    for i, (cin, pl_) in enumerate(zip(cins, planes)):
        m, v, _ = make_block(cin, pl_, h, w, seed=seed0 + i)
        ms.append(m)
        vs.append(v)
        fps.append(fold_bottleneck(v["params"], v["batch_stats"]))
    return ms, vs, fps


def test_fused_layer_matches_chained_blocks():
    """fused_layer (N blocks, one kernel) == chained flax blocks,
    including the growing-halo edge zeroing at both image borders."""
    from balancedgroupsoftmax_tpu.pallas.fused_block import fused_layer

    h, w = 16, 24
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, h, w, 64), jnp.float32)
    ms, vs, fps = _make_chain([64, 64, 64], [16, 16, 16], h, w)
    ref = x
    for m, v in zip(ms, vs):
        ref = m.apply(v, ref)
    for th in (4, h):  # multi-tile (edge cases) and single-tile
        out = fused_layer(x, fps, th=th, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3,
            err_msg=f"th={th}",
        )


def test_fused_layer_with_channel_change():
    """First chained block changes channels through its downsample (the
    layer1 entry block: 64 -> 256 at stride 1)."""
    from balancedgroupsoftmax_tpu.pallas.fused_block import fused_layer

    h, w = 8, 16
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(1, h, w, 32), jnp.float32)
    ms, vs, fps = _make_chain([32, 64, 64], [16, 16, 16], h, w, seed0=30)
    ref = x
    for m, v in zip(ms, vs):
        ref = m.apply(v, ref)
    out = fused_layer(x, fps, th=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
    )


def test_fused_block_chain():
    """Chained blocks reuse the row-padded output without re-padding."""
    m0, v0, x = make_block(64, 16, h=16, w=24, seed=7)
    m1, v1, _ = make_block(64, 16, h=16, w=24, seed=8)
    ref = m1.apply(v1, m0.apply(v0, x))
    f0 = fold_bottleneck(v0["params"], v0["batch_stats"])
    f1 = fold_bottleneck(v1["params"], v1["batch_stats"])
    out = unpad_rows(
        fused_bottleneck(fused_bottleneck(pad_rows(x), f0, interpret=True),
                         f1, interpret=True)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3
    )

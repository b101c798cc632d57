"""One-hot-matmul gather kernel: bit-exact f32 lane gather (interpret)."""

import numpy as np
import jax.numpy as jnp

from balancedgroupsoftmax_tpu.pallas.gather import gather_lanes_matmul


def test_gather_exact_per_group_planes():
    rng = np.random.RandomState(0)
    g, r, n, k = 12, 4, 250, 70  # odd sizes: exercises padding
    planes = rng.rand(g, r, n).astype(np.float32) * 1344.0
    idx = rng.randint(0, n, (g, k)).astype(np.int32)
    out = np.asarray(
        gather_lanes_matmul(jnp.asarray(planes), jnp.asarray(idx), interpret=True)
    )
    expect = np.stack([planes[i][:, idx[i]] for i in range(g)])
    # bit-exact: the bf16x3 split reconstructs every f32 exactly
    assert (out == expect).all()


def test_gather_exact_shared_plane():
    rng = np.random.RandomState(1)
    b, gpp, r, n, k = 3, 8, 4, 100, 33
    planes = (rng.rand(b, r, n).astype(np.float32) - 0.5) * 2048.0
    idx = rng.randint(0, n, (b * gpp, k)).astype(np.int32)
    out = np.asarray(
        gather_lanes_matmul(
            jnp.asarray(planes), jnp.asarray(idx),
            groups_per_plane=gpp, interpret=True,
        )
    )
    expect = np.stack(
        [planes[g // gpp][:, idx[g]] for g in range(b * gpp)]
    )
    assert (out == expect).all()


def test_gather_exact_adversarial_mantissas():
    # values that need all 24 mantissa bits (integers + tiny fractions)
    rng = np.random.RandomState(2)
    g, r, n, k = 4, 4, 64, 64
    planes = (
        rng.randint(0, 1 << 23, (g, r, n)).astype(np.float32) * 2.0**-10
    )
    idx = rng.randint(0, n, (g, k)).astype(np.int32)
    out = np.asarray(
        gather_lanes_matmul(jnp.asarray(planes), jnp.asarray(idx), interpret=True)
    )
    expect = np.stack([planes[i][:, idx[i]] for i in range(g)])
    assert (out == expect).all()


def test_multiclass_nms_gathered_path_matches_xla(monkeypatch):
    """Force the pallas candidate path (interpret kernels) against the XLA
    reference on the same inputs."""
    import balancedgroupsoftmax_tpu.kernels as kernels
    from balancedgroupsoftmax_tpu.pallas import gather as pg
    from balancedgroupsoftmax_tpu.pallas import nms as pn

    rng = np.random.RandomState(3)
    b, n, c = 2, 40, 7
    boxes = rng.rand(b, n, c * 4).astype(np.float32) * 200
    scores = rng.rand(b, n, c).astype(np.float32)
    valid = np.ones((b, n), bool)
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.05, 0.5, 10)

    ref = kernels.batched_multiclass_nms(*args)  # pallas disabled on CPU

    monkeypatch.setattr(kernels, "pallas_enabled", lambda: True)
    orig_g = pg.gather_lanes_matmul
    orig_n = pn.nms_keep_batched_coords
    orig_f = pn.nms_keep_gathered
    monkeypatch.setattr(
        pg, "gather_lanes_matmul",
        lambda *a, **kw: orig_g(*a, **{**kw, "interpret": True}),
    )
    monkeypatch.setattr(
        pn, "nms_keep_batched_coords",
        lambda *a, **kw: orig_n(*a, **{**kw, "interpret": True}),
    )
    monkeypatch.setattr(
        pn, "nms_keep_gathered",
        lambda *a, **kw: orig_f(*a, **{**kw, "interpret": True}),
    )
    got = kernels.batched_multiclass_nms(*args)

    for rr, gg in zip(ref, got):
        assert (np.asarray(rr) == np.asarray(gg)).all()

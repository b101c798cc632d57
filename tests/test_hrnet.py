import jax
import jax.numpy as jnp

from balancedgroupsoftmax_tpu.models.hrnet import HRFPN, HRNet


def test_hrnet_w18_branch_shapes():
    model = HRNet(arch="w18")
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 4
    # branch resolutions: /4, /8, /16, /32 with widths 18/36/72/144
    assert outs[0].shape == (1, 16, 24, 18)
    assert outs[1].shape == (1, 8, 12, 36)
    assert outs[2].shape == (1, 4, 6, 72)
    assert outs[3].shape == (1, 2, 3, 144)


def test_hrfpn_pyramid():
    import numpy as np

    rng = np.random.RandomState(0)
    inputs = tuple(
        jnp.asarray(rng.randn(1, 16 // 2**i, 24 // 2**i, [18, 36, 72, 144][i]).astype(np.float32))
        for i in range(4)
    )
    model = HRFPN(out_channels=64, num_outs=5)
    variables = model.init(jax.random.PRNGKey(0), inputs)
    outs = model.apply(variables, inputs)
    assert len(outs) == 5
    assert outs[0].shape == (1, 16, 24, 64)
    assert outs[4].shape == (1, 1, 1, 64)  # 16/2^4=1, 24/2^4 floors to 1


def test_hrnet_to_hrfpn_end_to_end():
    backbone = HRNet(arch="w18")
    neck = HRFPN(out_channels=32, num_outs=5)
    x = jnp.zeros((1, 64, 64, 3))
    bvars = backbone.init(jax.random.PRNGKey(0), x)
    feats = backbone.apply(bvars, x)
    nvars = neck.init(jax.random.PRNGKey(1), feats)
    outs = neck.apply(nvars, feats)
    assert len(outs) == 5
    assert outs[0].shape[-1] == 32

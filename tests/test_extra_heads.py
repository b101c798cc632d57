import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.models.extra_heads import (
    BFP,
    DoubleConvFCBBoxHead,
    MaskIoUHead,
    mask_iou_target,
)


def test_double_head_shapes():
    model = DoubleConvFCBBoxHead(num_classes=9, conv_out_channels=64, fc_out_channels=64)
    x = jnp.zeros((12, 7, 7, 256))
    variables = model.init(jax.random.PRNGKey(0), x)
    cls, reg = model.apply(variables, x)
    assert cls.shape == (12, 9)
    assert reg.shape == (12, 36)


def test_mask_iou_head_and_target():
    model = MaskIoUHead(num_classes=9, conv_out_channels=32, fc_out_channels=32)
    feats = jnp.zeros((6, 14, 14, 256))
    pred = jnp.zeros((6, 28, 28))
    variables = model.init(jax.random.PRNGKey(0), feats, pred)
    out = model.apply(variables, feats, pred)
    assert out.shape == (6, 8)

    # perfect prediction, gt fully inside proposal -> iou target 1
    m = jnp.ones((2, 28, 28))
    t = mask_iou_target(m, m, jnp.ones(2))
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-6)
    # gt twice as large outside the crop -> iou 0.5
    t2 = mask_iou_target(m, m, jnp.full(2, 0.5))
    np.testing.assert_allclose(np.asarray(t2), 0.5, atol=1e-6)


def test_bfp_preserves_shapes():
    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.randn(1, 32 // (2**i), 48 // (2**i), 16).astype(np.float32))
        for i in range(4)
    )
    model = BFP(refine_level=1, refine_type="conv")
    variables = model.init(jax.random.PRNGKey(0), feats)
    outs = model.apply(variables, feats)
    for o, f in zip(outs, feats):
        assert o.shape == f.shape
        # residual structure: output differs from input
        assert float(jnp.abs(o - f).max()) > 0


def test_res_layer_shared_head():
    from balancedgroupsoftmax_tpu.models.extra_heads import ResLayerSharedHead

    m = ResLayerSharedHead()
    x = jnp.zeros((2, 14, 14, 1024))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 7, 7, 2048)

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.config import ProposalConfig
from balancedgroupsoftmax_tpu.core.anchors import multilevel_anchors
from balancedgroupsoftmax_tpu.models.rpn import (
    rpn_proposals_batched,
    rpn_proposals_single,
)


def test_batched_proposals_match_single():
    rng = np.random.RandomState(0)
    B = 2
    sizes = [(16, 24), (8, 12), (4, 6)]
    strides = [8, 16, 32]
    anchors = [
        jnp.asarray(a)
        for a in multilevel_anchors(sizes, strides, scales=[8], ratios=[0.5, 1.0, 2.0])
    ]
    level_outs = [
        (
            jnp.asarray(rng.randn(B, h, w, 3).astype(np.float32)),
            jnp.asarray(rng.randn(B, h, w, 12).astype(np.float32) * 0.1),
        )
        for (h, w) in sizes
    ]
    shapes = jnp.asarray([[128.0, 192.0], [100.0, 150.0]])
    cfg = ProposalConfig(nms_pre=64, nms_post=32, max_num=48, nms_thr=0.7)

    batched = rpn_proposals_batched(level_outs, anchors, shapes, cfg)
    single = jax.vmap(
        lambda lo, s: rpn_proposals_single(lo, anchors, (s[0], s[1]), cfg)
    )(level_outs, shapes)

    for i in range(B):
        nb = int(np.asarray(batched.valid[i]).sum())
        ns = int(np.asarray(single.valid[i]).sum())
        assert nb == ns
        np.testing.assert_allclose(
            np.asarray(batched.scores[i][:nb]), np.asarray(single.scores[i][:ns]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(batched.boxes[i][:nb]), np.asarray(single.boxes[i][:ns]),
            rtol=1e-4, atol=1e-4,
        )

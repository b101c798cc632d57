import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.pallas.nms import nms_keep_batched, nms_keep_tiled
from tests.test_nms import np_greedy_nms, random_boxes


def test_pallas_nms_matches_greedy_interpret():
    rng = np.random.RandomState(0)
    g, k = 6, 50
    boxes = np.stack([random_boxes(rng, k, spread=60) for _ in range(g)])
    scores = -np.sort(-rng.rand(g, k).astype(np.float32), axis=1)  # descending
    valid = np.ones((g, k), bool)
    valid[0, 30:] = False  # padded tail

    keep = np.asarray(
        nms_keep_batched(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5, block=8, interpret=True
        )
    )
    for i in range(g):
        b = boxes[i][valid[i]]
        s = scores[i][valid[i]]
        expected = np_greedy_nms(b, s, 0.5)
        np.testing.assert_array_equal(keep[i][valid[i]], expected, err_msg=f"row {i}")
        assert not keep[i][~valid[i]].any()


def test_pallas_nms_tiled_matches_greedy_interpret():
    # k > tile so the cross-tile matmul suppression path is exercised
    rng = np.random.RandomState(1)
    g, k, tile = 3, 300, 128
    boxes = np.stack([random_boxes(rng, k, spread=80) for _ in range(g)])
    valid = np.ones((g, k), bool)
    valid[1, 250:] = False  # padded tail
    scores = -np.sort(-rng.rand(g, k).astype(np.float32), axis=1)

    keep = np.asarray(
        nms_keep_tiled(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5, tile=tile, interpret=True
        )
    )
    for i in range(g):
        b = boxes[i][valid[i]]
        s = scores[i][valid[i]]
        expected = np_greedy_nms(b, s, 0.5)
        np.testing.assert_array_equal(keep[i][valid[i]], expected, err_msg=f"row {i}")
        assert not keep[i][~valid[i]].any()


def test_pallas_nms_tiled_chain_across_tiles():
    # domino chain longer than one tile: box i suppresses box i+1 only, so
    # greedy keeps every other box; correctness requires the cross-tile
    # suppression to see finalized earlier-tile keeps.
    n, tile = 300, 128
    boxes = np.stack(
        [np.arange(n) * 12.0, np.zeros(n), np.arange(n) * 12.0 + 20, np.full(n, 20.0)],
        -1,
    ).astype(np.float32)[None]
    scores = np.linspace(1, 0.5, n).astype(np.float32)
    keep = np.asarray(
        nms_keep_tiled(
            jnp.asarray(boxes), jnp.ones((1, n), bool), 0.3, tile=tile, interpret=True
        )
    )[0]
    expected = np_greedy_nms(boxes[0], scores, 0.3)
    np.testing.assert_array_equal(keep, expected)


def test_pallas_nms_suppression_chain():
    n = 40
    boxes = np.stack(
        [np.arange(n) * 3.0, np.zeros(n), np.arange(n) * 3.0 + 20, np.full(n, 20.0)], -1
    ).astype(np.float32)[None]
    scores = np.linspace(1, 0.5, n).astype(np.float32)
    keep = np.asarray(
        nms_keep_batched(jnp.asarray(boxes), jnp.ones((1, n), bool), 0.5, block=8, interpret=True)
    )[0]
    expected = np_greedy_nms(boxes[0], scores, 0.5)
    np.testing.assert_array_equal(keep, expected)


def test_fused_gather_nms_matches_separate():
    """nms_keep_gathered == gather_lanes_matmul + nms_keep_batched_coords,
    bit-exact (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp

    from balancedgroupsoftmax_tpu.pallas.gather import gather_lanes_matmul
    from balancedgroupsoftmax_tpu.pallas.nms import (
        nms_keep_batched_coords, nms_keep_gathered,
    )

    rng = np.random.RandomState(4)
    g, n, k = 6, 120, 40
    planes = np.zeros((g, 4, n), np.float32)
    planes[:, 0] = rng.rand(g, n) * 300
    planes[:, 1] = rng.rand(g, n) * 300
    planes[:, 2] = planes[:, 0] + rng.rand(g, n) * 100
    planes[:, 3] = planes[:, 1] + rng.rand(g, n) * 100
    idx = rng.randint(0, n, (g, k)).astype(np.int32)
    valid = rng.rand(g, k) > 0.1

    cand_ref = gather_lanes_matmul(
        jnp.asarray(planes), jnp.asarray(idx), interpret=True
    )
    keep_ref = nms_keep_batched_coords(
        cand_ref, jnp.asarray(valid), 0.5, interpret=True
    )
    keep, cand = nms_keep_gathered(
        jnp.asarray(planes), jnp.asarray(idx), jnp.asarray(valid), 0.5,
        interpret=True,
    )
    assert (np.asarray(cand) == np.asarray(cand_ref)).all()
    assert (np.asarray(keep) == np.asarray(keep_ref)).all()

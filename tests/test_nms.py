import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.ops.nms import multiclass_nms, nms, nms_keep, soft_nms


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: (x[:, 2] - x[:, 0] + 1) * (x[:, 3] - x[:, 1] + 1)
    return inter / (area(a)[:, None] + area(b)[None, :] - inter)


def np_greedy_nms(boxes, scores, thr):
    """Sequential greedy NMS (reference nms_cpu.cpp semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for idx in order:
        if suppressed[idx]:
            continue
        keep[idx] = True
        suppressed |= iou[idx] > thr
        suppressed[idx] = True
    return keep


def random_boxes(rng, n, spread=100):
    ctr = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)


def test_nms_matches_sequential_greedy():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 200
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        for thr in (0.3, 0.5, 0.7):
            expected = np_greedy_nms(boxes, scores, thr)
            got = np.asarray(
                nms_keep(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), thr)
            )
            np.testing.assert_array_equal(got, expected)


def test_nms_dense_cluster_chain():
    # Overlapping chain: box i overlaps i+1 heavily — exercises suppression
    # chains that need multiple fixpoint rounds.
    n = 50
    boxes = np.stack(
        [np.arange(n) * 3.0, np.zeros(n), np.arange(n) * 3.0 + 20, np.full(n, 20.0)], -1
    ).astype(np.float32)
    scores = np.linspace(1, 0.5, n).astype(np.float32)
    expected = np_greedy_nms(boxes, scores, 0.5)
    got = np.asarray(nms_keep(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5))
    np.testing.assert_array_equal(got, expected)


def test_nms_respects_validity_and_maxout():
    rng = np.random.RandomState(1)
    n = 100
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = np.ones(n, bool)
    valid[50:] = False
    b, s, v = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 20)
    assert b.shape == (20, 4) and s.shape == (20,)
    expected = np_greedy_nms(boxes[:50], scores[:50], 0.5)
    assert int(np.asarray(v).sum()) == min(20, expected.sum())
    # scores descending
    sv = np.asarray(s)[np.asarray(v)]
    assert (np.diff(sv) <= 1e-6).all()


def test_nms_keep_ties_stable():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]], np.float32
    )
    scores = np.array([0.5, 0.5, 0.5], np.float32)
    keep = np.asarray(nms_keep(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(3, bool), 0.5))
    # stable tie-break: earlier index wins
    np.testing.assert_array_equal(keep, [True, False, True])


def np_soft_nms_linear(boxes, scores, iou_thr, min_score, max_out):
    boxes = boxes.copy()
    scores = scores.astype(np.float64).copy()
    alive = np.ones(len(boxes), bool)
    out = []
    for _ in range(max_out):
        if not alive.any():
            break
        i = np.argmax(np.where(alive, scores, -np.inf))
        if scores[i] <= min_score:
            break
        out.append((i, scores[i]))
        alive[i] = False
        iou = np_iou(boxes[i : i + 1], boxes)[0]
        decay = np.where(iou > iou_thr, 1 - iou, 1.0)
        scores[alive] *= decay[alive]
    return out


def test_soft_nms_matches_numpy():
    rng = np.random.RandomState(2)
    n = 60
    boxes = random_boxes(rng, n, spread=50)
    scores = rng.uniform(0.1, 1, n).astype(np.float32)
    expected = np_soft_nms_linear(boxes, scores, 0.3, 1e-3, 30)
    b, s, v = soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
        iou_thr=0.3, method="linear", min_score=1e-3, max_out=30,
    )
    got_n = int(np.asarray(v).sum())
    assert got_n == len(expected)
    exp_scores = np.array([e[1] for e in expected], np.float32)
    np.testing.assert_allclose(np.asarray(s)[:got_n], exp_scores, rtol=1e-4)


def test_multiclass_nms_matches_per_class_loop():
    rng = np.random.RandomState(3)
    n, c = 80, 6  # 5 fg classes
    boxes = random_boxes(rng, n)
    scores = rng.dirichlet(np.ones(c), n).astype(np.float32)
    score_thr, iou_thr, max_per_img = 0.05, 0.5, 20

    # numpy reference: per-class greedy loop (bbox_nms.py semantics)
    dets = []
    for i in range(1, c):
        m = scores[:, i] > score_thr
        if not m.any():
            continue
        keep = np_greedy_nms(boxes[m], scores[m, i], iou_thr)
        for b_, s_ in zip(boxes[m][keep], scores[m, i][keep]):
            dets.append((s_, i - 1, b_))
    dets.sort(key=lambda d: -d[0])
    dets = dets[:max_per_img]

    db, ds, dl, dv = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
        score_thr, iou_thr, max_per_img, class_chunk=2,
    )
    got_n = int(np.asarray(dv).sum())
    assert got_n == len(dets)
    np.testing.assert_allclose(
        np.asarray(ds)[:got_n], [d[0] for d in dets], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(dl)[:got_n], [d[1] for d in dets])
    np.testing.assert_allclose(
        np.asarray(db)[:got_n], np.stack([d[2] for d in dets]), rtol=1e-5
    )


def test_multiclass_nms_class_specific_boxes():
    rng = np.random.RandomState(4)
    n, c = 40, 4
    boxes = np.stack([random_boxes(rng, n) for _ in range(c)], 1).reshape(n, c * 4)
    scores = rng.dirichlet(np.ones(c), n).astype(np.float32)
    db, ds, dl, dv = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
        0.05, 0.5, 10, class_chunk=3,
    )
    assert db.shape == (10, 4)
    got_n = int(np.asarray(dv).sum())
    # every returned box must come from its class's box column
    for k in range(got_n):
        lbl = int(np.asarray(dl)[k]) + 1
        col = boxes.reshape(n, c, 4)[:, lbl]
        assert (np.abs(col - np.asarray(db)[k]).sum(-1) < 1e-4).any()


def test_batched_multiclass_soft_nms():
    from balancedgroupsoftmax_tpu.kernels import batched_multiclass_nms

    rng = np.random.RandomState(5)
    n, c = 60, 5
    boxes = random_boxes(rng, n)[None]
    scores = rng.dirichlet(np.ones(c), n).astype(np.float32)[None]
    valid = np.ones((1, n), bool)
    hb, hs, hl, hv = batched_multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        0.05, 0.5, 20, nms_type="nms",
    )
    sb, ss, sl, sv = batched_multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        0.05, 0.5, 20, nms_type="soft_nms",
    )
    assert np.isfinite(np.asarray(sb)).all()
    # soft-NMS keeps at least as many candidates (decay, not suppression)
    assert int(np.asarray(sv).sum()) >= int(np.asarray(hv).sum())
    # top-scoring detection identical under both (never decayed)
    np.testing.assert_allclose(np.asarray(ss[0, 0]), np.asarray(hs[0, 0]), rtol=1e-5)


def test_multiclass_nms_class_cap_exact():
    """Class pre-selection (class_cap) must not change the result: each
    class's top candidate survives greedy NMS, so only the top max_per_img
    classes by max score can reach the final detections."""
    from balancedgroupsoftmax_tpu.kernels import batched_multiclass_nms

    rng = np.random.RandomState(7)
    n, c = 50, 40  # 39 fg classes
    boxes = random_boxes(rng, n)[None]
    scores = rng.dirichlet(np.ones(c) * 0.05, n).astype(np.float32)[None]
    valid = np.ones((1, n), bool)
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.01, 0.5, 8)
    full = batched_multiclass_nms(*args, class_cap=1000)
    capped = batched_multiclass_nms(*args, class_cap=8)  # cap == max_per_img
    for a, b_ in zip(full, capped):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6)


def test_multiclass_nms_class_cap_class_specific_boxes():
    from balancedgroupsoftmax_tpu.kernels import batched_multiclass_nms

    rng = np.random.RandomState(8)
    n, c = 30, 25
    boxes = np.stack([random_boxes(rng, n) for _ in range(c)], 1)
    boxes = boxes.reshape(n, c * 4)[None]
    scores = rng.dirichlet(np.ones(c) * 0.05, n).astype(np.float32)[None]
    valid = np.ones((1, n), bool)
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            0.01, 0.5, 10)
    full = batched_multiclass_nms(*args, class_cap=1000)
    capped = batched_multiclass_nms(*args, class_cap=10)
    for a, b_ in zip(full, capped):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6)

import numpy as np

from balancedgroupsoftmax_tpu.data.pipeline import (
    DetBatcher,
    PipelineConfig,
    collate,
    expand_indices_by_repeat,
    preprocess_image,
    repeat_factors,
    rescale_size,
)


def test_rescale_size_keep_ratio():
    # landscape 640x480 -> short side 800 governs: 1066x800 (within 1333)
    w, h, f = rescale_size(640, 480, (1333, 800))
    assert (w, h) == (1067, 800)
    # very wide image: long side 1333 governs
    w, h, f = rescale_size(2000, 500, (1333, 800))
    assert w == 1333
    # mmcv rounding: int(d * f + 0.5)
    assert h == int(500 * (1333 / 2000) + 0.5)


def test_preprocess_static_bucket_and_boxes():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    boxes = np.array([[10.0, 20.0, 110.0, 220.0]])
    labels = np.array([3], np.int32)
    cfg = PipelineConfig(max_gt_boxes=8)
    s = preprocess_image(img, boxes, labels, cfg, train=False)
    assert s["image"].shape == (800, 1344, 3)
    assert s["gt_boxes"].shape == (8, 4)
    assert s["gt_mask"][:1].all() and not s["gt_mask"][1:].any()
    # boxes scaled by the resize factor
    f = 800 / 480
    np.testing.assert_allclose(
        s["gt_boxes"][0], np.asarray([10, 20, 110, 220]) * f, rtol=1e-2
    )
    np.testing.assert_allclose(s["img_shape"], [800, 1067])


def test_preprocess_flip_maps_boxes():
    rng = np.random.RandomState(1)
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[0.0, 0.0, 49.0, 99.0]])
    labels = np.array([1], np.int32)
    cfg = PipelineConfig(flip_prob=1.0, max_gt_boxes=4)
    s = preprocess_image(img, boxes, labels, cfg, train=True, rng=rng)
    assert s["flipped"]
    # flipped box hugs the right edge of the resized content
    new_w = s["img_shape"][1]
    assert abs(s["gt_boxes"][0, 2] - (new_w - 1)) < 1e-3


def test_multiscale_range_buckets():
    cfg = PipelineConfig(scale=(1400, 800), multiscale_range=(400, 1400))
    land, port = cfg.buckets()
    assert land == (1408, 1408)  # short side can reach 1400
    rng = np.random.RandomState(2)
    img = np.zeros((500, 700, 3), np.uint8)
    s = preprocess_image(
        img, np.zeros((0, 4), np.float32), np.zeros(0, np.int32), cfg, True, rng
    )
    assert s["image"].shape[:2] == land


def test_batcher_shards_and_buckets():
    flags = np.array([0] * 10 + [1] * 6)
    b = DetBatcher(flags, batch_size=2, seed=0, shard_id=0, num_shards=2)
    batches = b.epoch_batches(0)
    for batch in batches:
        assert len(batch) == 2
        assert len(set(flags[batch])) == 1  # homogeneous bucket
    # deterministic given epoch
    again = b.epoch_batches(0)
    assert all((x == y).all() for x, y in zip(batches, again))
    # different across epochs
    other = b.epoch_batches(1)
    assert any(not np.array_equal(x, y) for x, y in zip(batches, other))


def test_repeat_factors_formula():
    # class 1 in 1/100 images, t=0.01 -> r = sqrt(0.01/0.01) = 1
    labels = [np.array([1])] + [np.array([2])] * 99
    r = repeat_factors(labels, num_classes=2, t=0.04)
    # f_1 = 0.01 -> r_1 = sqrt(0.04/0.01) = 2; f_2 ~ 0.99 -> r = 1
    np.testing.assert_allclose(r[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(r[1], 1.0, rtol=1e-6)
    idx = expand_indices_by_repeat(r, epoch_seed=0)
    assert (idx == 0).sum() == 2  # integer factor repeats exactly


def test_repeat_factors_small_fixture_needs_scaled_t():
    """The round-2 RFS ablation bug class: on a 401-image fixture the LVIS
    default t=0.001 sits below every class's image frequency, so every
    factor is exactly 1 (a silent no-op); the auto-scale rule t=8/n used by
    run_longtail_ablation.py produces real upsampling of the tail."""
    rng = np.random.RandomState(0)
    n = 401
    # power-law-ish: 5 head classes everywhere, 30 tail classes in 1-5 images
    labels = [np.array([int(rng.randint(5))]) for _ in range(n)]
    for c in range(5, 35):
        for _ in range(1 + int(rng.randint(5))):
            i = int(rng.randint(n))
            labels[i] = np.append(labels[i], c)
    r_default = repeat_factors(labels, num_classes=35, t=0.001)
    assert (r_default == 1.0).all()  # the no-op regime
    r_scaled = repeat_factors(labels, num_classes=35, t=8.0 / n)
    assert (r_scaled > 1.0).any()
    assert r_scaled.max() > 1.5  # rarest (1-image) class: sqrt(8) ~ 2.83


def test_tta_content_flip_matches_pipeline_flip():
    """flip_image_content on a preprocessed (padded) image must equal the
    pipeline's own RandomFlip (applied before Pad) — flipping the padded
    canvas instead would shift content by the pad width."""
    import numpy as np

    from balancedgroupsoftmax_tpu.data.pipeline import (
        PipelineConfig, preprocess_image,
    )
    from balancedgroupsoftmax_tpu.eval.aug import flip_image_content

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3), np.uint8)
    none = np.zeros((0, 4), np.float32)
    cfg = PipelineConfig(flip_prob=1.0, max_gt_boxes=4)
    plain = preprocess_image(img, none, np.zeros(0, np.int32), cfg, False)
    flipped = preprocess_image(
        img, none, np.zeros(0, np.int32), cfg, True, np.random.RandomState(1)
    )
    assert flipped["flipped"]
    got = flip_image_content(
        plain["image"][None], plain["img_shape"][None]
    )[0]
    assert np.allclose(got, flipped["image"])
    # and the padded-canvas flip would NOT match
    assert not np.allclose(plain["image"][:, ::-1], flipped["image"])


def test_tta_unflip_boxes_roundtrip():
    import numpy as np

    from balancedgroupsoftmax_tpu.eval.aug import unflip_boxes

    new_w, sf = 1067.0, 1.6671875
    boxes = np.array([[10.0, 5.0, 50.0, 40.0]], np.float32)
    # flip at network scale, rescale back, then unflip_boxes must recover
    net = boxes * sf
    flipped_net = net.copy()
    flipped_net[:, 0] = new_w - net[:, 2] - 1
    flipped_net[:, 2] = new_w - net[:, 0] - 1
    back = unflip_boxes(flipped_net / sf, new_w, sf)
    assert np.allclose(back, boxes, atol=1e-4)

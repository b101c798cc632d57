import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.config import TrainConfig
from balancedgroupsoftmax_tpu.models.detector import build_detector
from balancedgroupsoftmax_tpu.parallel.optim import (
    lr_schedule,
    make_optimizer,
    trainable_mask,
)
from balancedgroupsoftmax_tpu.parallel.train import (
    create_train_state,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_train_step,
)
from tests.test_detector import make_batch, tiny_config, tiny_partition


def test_lr_schedule_warmup_and_steps():
    cfg = TrainConfig(lr=0.01, warmup_iters=500, warmup_ratio=1 / 3, lr_step_epochs=(8, 11))
    sched = lr_schedule(cfg, steps_per_epoch=100)
    np.testing.assert_allclose(float(sched(0)), 0.01 / 3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(250)), 0.01 * (1 / 3 + 2 / 3 * 0.5), rtol=1e-5)
    np.testing.assert_allclose(float(sched(500)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(sched(799)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(sched(800)), 0.001, rtol=1e-5)
    np.testing.assert_allclose(float(sched(1100)), 0.0001, rtol=1e-5)


def test_trainable_mask_selectp():
    cfg = tiny_config()
    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    params = variables["params"]

    m0 = trainable_mask(params, selectp=0, frozen_stages=1)
    # conv1 and layer1 frozen, layer2+ trainable
    assert m0["backbone"]["conv1"]["kernel"] is False
    assert m0["backbone"]["bn1"]["scale"] is False
    assert m0["backbone"]["layer1_block0"]["conv1"]["kernel"] is False
    assert m0["backbone"]["layer2_block0"]["conv1"]["kernel"] is True
    assert m0["bbox_head"]["fc_cls"]["kernel"] is True
    assert m0["rpn_head"]["rpn_conv"]["kernel"] is True

    m1 = trainable_mask(params, selectp=1)
    flat = jax.tree_util.tree_leaves_with_path(m1)
    for path, v in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        assert v == ("fc_cls" in name), name


def test_single_device_train_step_updates_params():
    cfg = tiny_config()
    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    tcfg = TrainConfig(lr=0.01, warmup_iters=1)
    tx = make_optimizer(tcfg, variables["params"], steps_per_epoch=100)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx))

    batch_t = make_batch(b=2)
    batch = dict(
        images=batch_t[0], gt_boxes=batch_t[1], gt_labels=batch_t[2],
        gt_mask=batch_t[3], img_shapes=batch_t[4],
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # frozen params unchanged, trainable changed
    p0 = state.params["backbone"]["conv1"]["kernel"]
    p1 = new_state.params["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    h0 = state.params["bbox_head"]["fc_cls"]["kernel"]
    h1 = new_state.params["bbox_head"]["fc_cls"]["kernel"]
    assert np.abs(np.asarray(h0) - np.asarray(h1)).max() > 0


def test_selectp1_only_fc_cls_moves():
    cfg = tiny_config(use_gs=True)
    model = build_detector(cfg, partition=tiny_partition())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    tcfg = TrainConfig(lr=0.01, warmup_iters=1, selectp=1)
    tx = make_optimizer(tcfg, variables["params"])
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx))
    batch_t = make_batch(b=2)
    batch = dict(
        images=batch_t[0], gt_boxes=batch_t[1], gt_labels=batch_t[2],
        gt_mask=batch_t[3], img_shapes=batch_t[4],
    )
    new_state, _ = step(state, batch, jax.random.PRNGKey(1))
    flat_old = jax.tree_util.tree_leaves_with_path(state.params)
    flat_new = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(new_state.params)
    )
    for path, old in flat_old:
        name = jax.tree_util.keystr(path)
        new = flat_new[name]
        changed = np.abs(np.asarray(old) - np.asarray(new)).max() > 0
        if "fc_cls" in name:
            assert changed, name
        else:
            assert not changed, name


def test_trainable_mask_elides_frozen_backward_equivalently():
    """make_train_step(trainable=mask): frozen subtrees' backward is elided
    via stop_gradient (requires_grad=False parity, reference
    apis/train.py:100) — the resulting update must be IDENTICAL to the
    mask-less step (whose optimizer zeroes frozen updates after a wasted
    full backward), including the global-norm grad clip, because
    _zero_frozen runs before the clip in both cases."""
    cfg = tiny_config(use_gs=True)
    model = build_detector(cfg, partition=tiny_partition())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    tcfg = TrainConfig(lr=0.01, warmup_iters=1, selectp=1)
    tx = make_optimizer(tcfg, variables["params"])
    mask = trainable_mask(variables["params"], tcfg.selectp)
    batch_t = make_batch(b=2)
    batch = dict(
        images=batch_t[0], gt_boxes=batch_t[1], gt_labels=batch_t[2],
        gt_mask=batch_t[3], img_shapes=batch_t[4],
    )

    state_a = create_train_state(variables, tx)
    state_b = create_train_state(variables, tx)
    step_full = jax.jit(make_train_step(model, tx))
    step_elided = jax.jit(make_train_step(model, tx, trainable=mask))
    new_a, m_a = step_full(state_a, batch, jax.random.PRNGKey(1))
    new_b, m_b = step_elided(state_b, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)
    for (pa, va), (pb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(new_a.params),
        jax.tree_util.tree_leaves_with_path(new_b.params),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_multichip_dp_train_step():
    """8-way data parallel on the virtual CPU mesh."""
    assert jax.device_count() == 8
    cfg = tiny_config()
    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    tcfg = TrainConfig(lr=0.02, warmup_iters=1)
    tx = make_optimizer(tcfg, variables["params"])
    state = create_train_state(variables, tx)

    mesh = make_mesh(8)
    step = shard_train_step(make_train_step(model, tx), mesh)

    batch_t = make_batch(b=8)
    batch = dict(
        images=batch_t[0], gt_boxes=batch_t[1], gt_labels=batch_t[2],
        gt_mask=batch_t[3], img_shapes=batch_t[4],
    )
    batch = shard_batch(batch, mesh)
    state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    new_state2, metrics2 = step(new_state, batch, jax.random.PRNGKey(0))
    assert int(new_state2.step) == 2
    assert np.isfinite(float(metrics2["loss"]))

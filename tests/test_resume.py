"""Optimizer-state resume parity.

The reference's runner.resume restores optimizer state + iteration
(/root/reference/mmdet/apis/train.py:201-204), so a resumed run continues
the exact SGD-momentum trajectory of an unbroken one. These tests pin the
same guarantee for our orbax checkpoint round-trip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from balancedgroupsoftmax_tpu.config import TrainConfig
from balancedgroupsoftmax_tpu.models.detector import build_detector
from balancedgroupsoftmax_tpu.parallel.optim import make_optimizer
from balancedgroupsoftmax_tpu.parallel.train import create_train_state, make_train_step
from balancedgroupsoftmax_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from tests.test_detector import make_batch, tiny_config


def _full_state_dict(st):
    return dict(
        params=st.params, batch_stats=st.batch_stats,
        opt_state=st.opt_state, step=np.asarray(int(st.step)),
    )


def test_resume_continues_momentum_trajectory(tmp_path):
    cfg = tiny_config()
    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    tcfg = TrainConfig(lr=0.05, warmup_iters=1)

    def fresh_state():
        tx = make_optimizer(tcfg, variables["params"], steps_per_epoch=100)
        return create_train_state(variables, tx), tx

    batch_t = make_batch(b=2)
    batch = dict(
        images=batch_t[0], gt_boxes=batch_t[1], gt_labels=batch_t[2],
        gt_mask=batch_t[3], img_shapes=batch_t[4],
    )
    key = jax.random.PRNGKey(7)

    # unbroken: 3 steps
    state, tx = fresh_state()
    step = jax.jit(make_train_step(model, tx))
    for _ in range(3):
        state, _ = step(state, batch, key)
    unbroken = jax.device_get(state.params)

    # broken: 1 step -> save -> restore into a fresh state -> 2 steps
    state_b, tx_b = fresh_state()
    step_b = jax.jit(make_train_step(model, tx_b))
    state_b, _ = step_b(state_b, batch, key)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, jax.device_get(_full_state_dict(state_b)))

    state_r, tx_r = fresh_state()
    loaded = restore_checkpoint(ckpt, jax.device_get(_full_state_dict(state_r)))
    state_r = state_r.replace(
        params=loaded["params"],
        batch_stats=loaded["batch_stats"],
        opt_state=loaded["opt_state"],
        step=jnp.asarray(int(loaded["step"]), jnp.int32),
    )
    assert int(loaded["step"]) == 1
    step_r = jax.jit(make_train_step(model, tx_r))
    for _ in range(2):
        state_r, _ = step_r(state_r, batch, key)
    resumed = jax.device_get(state_r.params)

    # momentum carried over => bitwise-identical trajectories
    flat_u = jax.tree_util.tree_leaves_with_path(unbroken)
    flat_r = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(resumed)
    }
    for path, u in flat_u:
        name = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(u), np.asarray(flat_r[name]), name)


def test_resume_without_momentum_diverges(tmp_path):
    """Control: dropping opt_state (the old behavior) does NOT reproduce the
    unbroken trajectory — proving the momentum restore is load-bearing."""
    cfg = tiny_config()
    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    tcfg = TrainConfig(lr=0.05, warmup_iters=1)

    def fresh_state():
        tx = make_optimizer(tcfg, variables["params"], steps_per_epoch=100)
        return create_train_state(variables, tx), tx

    batch_t = make_batch(b=2)
    batch = dict(
        images=batch_t[0], gt_boxes=batch_t[1], gt_labels=batch_t[2],
        gt_mask=batch_t[3], img_shapes=batch_t[4],
    )
    key = jax.random.PRNGKey(7)

    state, tx = fresh_state()
    step = jax.jit(make_train_step(model, tx))
    for _ in range(3):
        state, _ = step(state, batch, key)
    unbroken = jax.device_get(state.params)

    state_b, tx_b = fresh_state()
    step_b = jax.jit(make_train_step(model, tx_b))
    state_b, _ = step_b(state_b, batch, key)

    state_r, tx_r = fresh_state()  # fresh opt_state: momentum zeroed
    state_r = state_r.replace(
        params=state_b.params,
        batch_stats=state_b.batch_stats,
        step=state_b.step,
    )
    step_r = jax.jit(make_train_step(model, tx_r))
    for _ in range(2):
        state_r, _ = step_r(state_r, batch, key)

    u = np.asarray(unbroken["bbox_head"]["fc_cls"]["kernel"])
    r = np.asarray(jax.device_get(state_r.params)["bbox_head"]["fc_cls"]["kernel"])
    assert np.abs(u - r).max() > 0

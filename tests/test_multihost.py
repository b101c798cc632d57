"""Multi-host utilities (parallel/multihost.py).

True multi-process behavior can't run in one test process; these pin the
single-process degradations (exactly what every CLI run here exercises)
and the shard arithmetic for arbitrary process counts.
"""

import numpy as np

from balancedgroupsoftmax_tpu.parallel.multihost import (
    all_gather_objects,
    gather_detection_records,
    host_shard,
)


def test_host_shard_single_process():
    np.testing.assert_array_equal(host_shard(7), np.arange(7))


def test_host_shard_partition_covers_exactly():
    for n in (0, 1, 7, 16, 23):
        for p in (1, 2, 3, 8):
            parts = [host_shard(n, i, p) for i in range(p)]
            merged = np.concatenate(parts) if parts else np.zeros(0, int)
            np.testing.assert_array_equal(merged, np.arange(n))  # no dup/gap


def test_all_gather_objects_single_process():
    obj = {"a": np.arange(3), "b": "x"}
    out = all_gather_objects(obj)
    assert len(out) == 1 and out[0] is obj


def test_gather_detection_records_single_process():
    recs = [{"image_id": 1, "score": 0.5}, {"image_id": 2, "score": 0.1}]
    assert gather_detection_records(recs) == recs

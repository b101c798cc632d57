"""Test environment: force a virtual 8-device CPU platform before JAX use.

This lets every multi-chip sharding test run without TPU hardware, which the
reference (NCCL-only, /root/reference/mmdet/apis/env.py) could not do.

Note: setting JAX_PLATFORMS in the environment is not enough here — the
hosting image pins an `axon` TPU platform that overrides it, so we also set
the config explicitly right after import (before any backend is initialized).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

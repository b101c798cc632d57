"""balancedgroupsoftmax_tpu — a TPU-native (JAX/XLA/Pallas) detection framework.

A from-scratch rebuild of the capabilities of FishYuLi/BalancedGroupSoftmax
(CVPR 2020 "Overcoming Classifier Imbalance for Long-tail Object Detection
with Balanced Group Softmax"): long-tailed detection / instance segmentation
on LVIS v0.5 with Faster/Mask/Cascade R-CNN and HTC hosts and the grouped
softmax (BAGS) classification head.

Design stance (see SURVEY.md §7): pure functions over fixed-shape arrays with
validity masks, flax.linen modules for parameterized layers, one jitted train
step with psum over a `jax.sharding.Mesh`, and Pallas kernels for the hot ops
(RoIAlign, NMS) replacing the reference's CUDA extensions.
"""

__version__ = "0.1.0"


def apply_platform_override() -> None:
    """Honor BAGS_PLATFORM=cpu|tpu for CLI runs.

    `env JAX_PLATFORMS=cpu` alone cannot force the backend on hosts whose
    sitecustomize registers a TPU PJRT plugin and REWRITES the env var
    inside every process; jax.config.update("jax_platforms", ...) wins
    over the env, so a separate variable the site hook does not touch is
    the only reliable CLI-level override (tests/conftest.py does the same
    forcing for the test suite).
    """
    import os

    plat = os.environ.get("BAGS_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (big win on the remote-TPU
    tunnel and for repeated CLI runs). Also applies BAGS_PLATFORM."""
    import os

    import jax

    apply_platform_override()

    path = path or os.environ.get(
        "BAGS_COMPILE_CACHE", os.path.expanduser("~/.cache/bags_jax")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

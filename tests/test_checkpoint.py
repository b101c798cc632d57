import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balancedgroupsoftmax_tpu.utils.checkpoint import (
    _conv,
    _fc_from_torch,
    convert_torchvision_resnet,
    restore_checkpoint,
    save_checkpoint,
    warm_start,
)


def test_conv_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)  # OIHW
    x = rng.randn(1, 3, 16, 16).astype(np.float32)  # NCHW
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()

    import flax.linen as nn

    conv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    params = {"params": {"kernel": jnp.asarray(_conv(w))}}
    got = conv.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), ref, atol=1e-4
    )


def test_fc_roi_flattening_conversion():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    C, S, O = 4, 3, 5
    w = rng.randn(O, C * S * S).astype(np.float32)
    feat_chw = rng.randn(C, S, S).astype(np.float32)
    ref = w @ feat_chw.reshape(-1)

    kernel = _fc_from_torch(w, roi=S, channels=C)  # (in=HWC, out)
    feat_hwc = np.transpose(feat_chw, (1, 2, 0)).reshape(-1)
    np.testing.assert_allclose(feat_hwc @ kernel, ref, atol=1e-4)


def _fake_torchvision_sd(depth=50):
    from balancedgroupsoftmax_tpu.models.resnet import ARCH_SETTINGS

    rng = np.random.RandomState(0)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5

    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05
    bn("bn1", 64)
    in_c = 64
    for stage, nb in enumerate(ARCH_SETTINGS[depth]):
        planes = 64 * 2**stage
        out_c = planes * 4
        for b in range(nb):
            p = f"layer{stage + 1}.{b}"
            sd[f"{p}.conv1.weight"] = rng.randn(planes, in_c if b == 0 else out_c, 1, 1).astype(np.float32) * 0.05
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = rng.randn(planes, planes, 3, 3).astype(np.float32) * 0.05
            bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = rng.randn(out_c, planes, 1, 1).astype(np.float32) * 0.05
            bn(f"{p}.bn3", out_c)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = rng.randn(out_c, in_c, 1, 1).astype(np.float32) * 0.05
                bn(f"{p}.downsample.1", out_c)
        in_c = out_c
    return sd


def test_torchvision_resnet50_conversion_loads():
    from balancedgroupsoftmax_tpu.models.resnet import ResNet

    sd = _fake_torchvision_sd()
    params, stats = convert_torchvision_resnet(sd, 50)
    model = ResNet(depth=50)
    x = jnp.zeros((1, 64, 64, 3))
    ref_vars = model.init(jax.random.PRNGKey(0), x)
    # structures must match exactly
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref_vars["params"])
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes
    outs = model.apply({"params": params, "batch_stats": stats}, x)
    assert len(outs) == 4
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_warm_start_shape_mismatch():
    init = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5), "d": np.zeros(2)}}
    loaded = {"a": np.ones((3, 4)), "b": {"c": np.ones(7)}}  # c mismatched, d missing
    out, copied, skipped = warm_start(init, loaded)
    np.testing.assert_allclose(out["a"], 1.0)
    np.testing.assert_allclose(out["b"]["c"], 0.0)
    assert any("a" in c for c in copied)
    assert len(skipped) == 2


def test_orbax_roundtrip(tmp_path):
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "step": np.int32(7)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, state)
    np.testing.assert_allclose(restored["w"], state["w"])
    assert int(restored["step"]) == 7


def test_orbax_overwrite(tmp_path):
    path = str(tmp_path / "auto")
    save_checkpoint(path, {"w": np.zeros(3)})
    save_checkpoint(path, {"w": np.ones(3)})  # autosave-style overwrite
    restored = restore_checkpoint(path, {"w": np.zeros(3)})
    np.testing.assert_allclose(restored["w"], 1.0)


def test_orbax_async_save(tmp_path):
    from balancedgroupsoftmax_tpu.utils.checkpoint import wait_for_checkpoints

    path = str(tmp_path / "async")
    state = {"w": np.full((4, 4), 3.0, np.float32)}
    save_checkpoint(path, state, block=False)
    # source mutated after save returns must not leak into the checkpoint
    # (save snapshots to host before returning)
    state["w"][:] = -1.0
    wait_for_checkpoints()
    restored = restore_checkpoint(path, {"w": np.zeros((4, 4), np.float32)})
    np.testing.assert_allclose(restored["w"], 3.0)


def test_orbax_async_overwrite_sequence(tmp_path):
    from balancedgroupsoftmax_tpu.utils.checkpoint import wait_for_checkpoints

    path = str(tmp_path / "auto")
    for v in (1.0, 2.0, 3.0):  # back-to-back autosaves must serialize
        save_checkpoint(path, {"w": np.full(3, v)}, block=False)
    wait_for_checkpoints()
    restored = restore_checkpoint(path, {"w": np.zeros(3)})
    np.testing.assert_allclose(restored["w"], 3.0)


def test_tau_norm_row_scaling():
    import sys

    sys.path.insert(0, ".")
    from tools.test_lvis import tau_norm

    rng = np.random.RandomState(0)
    w = rng.randn(16, 5).astype(np.float32)
    params = {"bbox_head": {"fc_cls": {"kernel": w, "bias": np.zeros(5)}}}
    out = tau_norm(params, tau=1.0)["bbox_head"]["fc_cls"]["kernel"]
    # tau=1: every column normalized to unit norm
    np.testing.assert_allclose(np.linalg.norm(out, axis=0), 1.0, rtol=1e-5)
    out05 = tau_norm(params, tau=0.5)["bbox_head"]["fc_cls"]["kernel"]
    norms = np.linalg.norm(w, axis=0)
    np.testing.assert_allclose(
        np.linalg.norm(out05, axis=0), norms**0.5, rtol=1e-5
    )
    # tau=0: unchanged
    np.testing.assert_allclose(
        tau_norm(params, 0.0)["bbox_head"]["fc_cls"]["kernel"], w
    )

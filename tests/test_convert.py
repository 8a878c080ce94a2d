"""Checkpoint conversion: synthetic OIHW state dicts -> Flax params that the
models accept, with a torch-conv parity check on the first layer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def synthetic_superpoint_state(rng):
    shapes = {
        "conv1a": (64, 1, 3, 3), "conv1b": (64, 64, 3, 3),
        "conv2a": (64, 64, 3, 3), "conv2b": (64, 64, 3, 3),
        "conv3a": (128, 64, 3, 3), "conv3b": (128, 128, 3, 3),
        "conv4a": (128, 128, 3, 3), "conv4b": (128, 128, 3, 3),
        "convPa": (256, 128, 3, 3), "convPb": (65, 256, 1, 1),
        "convDa": (256, 128, 3, 3), "convDb": (256, 256, 1, 1),
    }
    sd = {}
    for name, s in shapes.items():
        sd[f"{name}.weight"] = rng.normal(size=s).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.normal(size=s[0]).astype(np.float32) * 0.01
    return sd


class TestSuperPointConversion:
    def test_converted_params_run(self):
        from feature_detector_tpu.models.convert import superpoint_from_torch
        from feature_detector_tpu.models.superpoint import SuperPoint

        rng = np.random.default_rng(0)
        sd = synthetic_superpoint_state(rng)
        params = superpoint_from_torch(sd)

        m = SuperPoint(dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(size=(1, 32, 48, 1)).astype(np.float32))
        # Param-tree structural compatibility with random init.
        ref = m.init(jax.random.PRNGKey(0), x)
        ref_shapes = jax.tree.map(lambda a: a.shape, ref)
        got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
        assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
        assert jax.tree.all(jax.tree.map(lambda a, b: a == b, ref_shapes, got_shapes))

        heat, desc = m.apply(params, x)
        assert np.isfinite(np.asarray(heat)).all()
        assert heat.shape == (1, 32, 48)

    def test_first_conv_matches_torch(self):
        """Converted first layer must equal torch's conv2d output."""
        torch = pytest.importorskip("torch")
        from feature_detector_tpu.models.convert import superpoint_from_torch
        from feature_detector_tpu.models.superpoint import SuperPoint

        rng = np.random.default_rng(1)
        sd = synthetic_superpoint_state(rng)
        params = superpoint_from_torch(sd)
        x = rng.uniform(size=(1, 16, 16, 1)).astype(np.float32)

        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
            tw = torch.from_numpy(sd["conv1a.weight"])
            tb = torch.from_numpy(sd["conv1a.bias"])
            want = torch.relu(torch.nn.functional.conv2d(tx, tw, tb, padding=1))
            want = want.numpy().transpose(0, 2, 3, 1)

        kernel = jnp.asarray(params["params"]["conv1a"]["Conv_0"]["kernel"])
        bias = jnp.asarray(params["params"]["conv1a"]["Conv_0"]["bias"])
        got = jax.lax.conv_general_dilated(
            jnp.asarray(x), kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        got = jax.nn.relu(got)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def synthetic_disk_state(rng):
    """State dict shaped like the published cvlab-epfl/disk thin U-Net:
    9 convs (down 16/32/64/64/64, up 64/64/64/129 with skip-concat input
    channels) and 8 per-channel PReLU gates; affine-free InstanceNorms
    contribute no entries.  Keys use the unets package's naming."""
    out_ch = (16, 32, 64, 64, 64, 64, 64, 64, 129)
    in_ch = (3, 16, 32, 64, 64, 128, 128, 96, 80)
    sd = {}
    for i in range(9):
        path = f"unet.path_down.{i}" if i < 5 else f"unet.path_up.{i - 5}"
        if i > 0:
            sd[f"{path}.conv.0.gate.weight"] = np.full(in_ch[i], 0.25, np.float32)
        sd[f"{path}.conv.1.weight"] = (
            rng.normal(size=(out_ch[i], in_ch[i], 5, 5)).astype(np.float32) * 0.05
        )
        sd[f"{path}.conv.1.bias"] = np.zeros(out_ch[i], np.float32)
    return sd


class TestDiskConversion:
    def test_converted_params_run(self):
        from feature_detector_tpu.models.convert import disk_from_torch
        from feature_detector_tpu.models.disk import Disk

        rng = np.random.default_rng(2)
        params = disk_from_torch(synthetic_disk_state(rng))

        m = Disk(dtype=jnp.float32)
        x = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)).astype(np.float32))
        ref = m.init(jax.random.PRNGKey(0), x)
        ref_shapes = jax.tree.map(lambda a: a.shape, ref)
        got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
        assert jax.tree.structure(ref_shapes) == jax.tree.structure(got_shapes)
        assert jax.tree.all(jax.tree.map(lambda a, b: a == b, ref_shapes, got_shapes))
        heat, desc = m.apply(params, x)
        assert np.isfinite(np.asarray(heat)).all()
        assert heat.shape == (1, 32, 48)
        assert desc.shape == (1, 32, 48, 128)
        assert float(heat.min()) >= 0.0 and float(heat.max()) <= 1.0

    def test_rejects_wrong_layout(self):
        from feature_detector_tpu.models.convert import disk_from_torch

        rng = np.random.default_rng(3)
        sd = synthetic_disk_state(rng)
        sd.pop("unet.path_up.3.conv.1.weight")
        sd.pop("unet.path_up.3.conv.1.bias")
        with pytest.raises(ValueError):
            disk_from_torch(sd)

"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (SURVEY.md §4: the TPU-native analogue of a
fake distributed backend)."""

import os

# Force CPU with 8 virtual devices even when the environment pins
# JAX_PLATFORMS to a TPU platform (sitecustomize registers the TPU plugin
# before this file runs, so the env var alone is too late): unit tests must
# not contend for the single TPU tunnel, and the 8-device mesh is how
# multi-chip sharding is validated without hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: keeps repeated test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


REFERENCE_IMAGE = "/root/reference/examples/image.png"
REFERENCE_IMAGE2 = "/root/reference/examples/image2.png"


@pytest.fixture(scope="session")
def image():
    """752x480 example image (examples/image.png), the reference demos' input."""
    from feature_detector_tpu.io.images import load_gray

    return load_gray(REFERENCE_IMAGE)


@pytest.fixture(scope="session")
def image2():
    from feature_detector_tpu.io.images import load_gray

    return load_gray(REFERENCE_IMAGE2)


@pytest.fixture(scope="session")
def small_image(image):
    """A 120x160 crop for fast unit tests."""
    return np.ascontiguousarray(image[100:220, 200:360])


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

"""Test env: CPU backend with 8 virtual devices (SURVEY.md §4).

Must run before the first jax import anywhere in the test session.
"""

import os

# this environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests must run
# on the virtual multi-device CPU backend, so override hard.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def make_pyramid(
    batch_size=2, height=64, width=64, channels=(3, 8, 16, 32, 64, 64), rng=None
):
    """Synthetic NHWC feature pyramid: [input] + levels 1..N.

    The universal fixture trick of the reference tests
    (``tests/heads/test_object_detection.py:32-37``): heads/necks are tested
    against the pyramid contract without a real backbone.
    """
    rng = rng or np.random.RandomState(0)
    out = []
    for level, c in enumerate(channels):
        h, w = height // 2**level, width // 2**level
        out.append(rng.rand(batch_size, h, w, c).astype(np.float32))
    return out


@pytest.fixture
def pyramid(rng):
    return make_pyramid(rng=rng)

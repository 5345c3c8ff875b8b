"""Neck tests against the pyramid contract (mirrors reference
``tests/layers/test_fpn.py`` / ``test_bifpn.py``)."""

import numpy as np
import jax.numpy as jnp
import pytest
from flax import nnx

from sihl_tpu.layers import FPN, BiFPN, PAN, HybridEncoder

from conftest import make_pyramid


CHANNELS = (3, 8, 16, 32, 64, 64)


def _make_pyramid_for(top):
    return make_pyramid(height=128 if top > 5 else 64, width=128 if top > 5 else 64,
                        channels=CHANNELS)


def _check_contract(neck, pyramid, bottom, top, out_c):
    outs = neck([jnp.asarray(x) for x in pyramid])
    assert len(outs) == max(len(pyramid), top + 1)
    assert neck.out_channels[:bottom] == list(CHANNELS[:bottom])
    for level in range(bottom, top + 1):
        expected_h = pyramid[0].shape[1] // 2**level
        assert outs[level].shape == (
            pyramid[0].shape[0],
            expected_h,
            expected_h,
            out_c,
        ), level
        assert neck.out_channels[level] == out_c
    # untouched levels pass through
    for level in range(bottom):
        assert np.allclose(np.asarray(outs[level]), pyramid[level])


@pytest.mark.parametrize("top", [5, 7])
def test_fpn(top):
    pyramid = _make_pyramid_for(top)
    neck = FPN(list(CHANNELS), 24, bottom_level=3, top_level=top, rngs=nnx.Rngs(0))
    _check_contract(neck, pyramid, 3, top, 24)


@pytest.mark.parametrize("top", [5, 7])
def test_bifpn(top):
    pyramid = _make_pyramid_for(top)
    neck = BiFPN(list(CHANNELS), 24, bottom_level=3, top_level=top, rngs=nnx.Rngs(0))
    _check_contract(neck, pyramid, 3, top, 24)


def test_pan():
    pyramid = make_pyramid(channels=CHANNELS)
    neck = PAN(list(CHANNELS), 24, bottom_level=3, top_level=5, rngs=nnx.Rngs(0))
    _check_contract(neck, pyramid, 3, 5, 24)


@pytest.mark.parametrize("top", [5, 7])
def test_hybrid_encoder(top):
    pyramid = _make_pyramid_for(top)
    neck = HybridEncoder(list(CHANNELS), 32, bottom_level=3, top_level=top, rngs=nnx.Rngs(0))
    _check_contract(neck, pyramid, 3, top, 32)

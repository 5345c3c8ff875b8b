"""Unit tests for layers not covered elsewhere: transformer blocks,
scalers, attention."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers import (
    AntialiasedDownscaler,
    BilinearAdditiveUpscaler,
    CBAM,
    ChannelAttention,
    CrossCBAM,
    SimpleDownscaler,
    SimpleUpscaler,
    SpatialAttention,
    StridedDownscaler,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
)


def test_scalers_shapes():
    x = jnp.ones((2, 16, 16, 8))
    for scaler in (
        StridedDownscaler(8, 12, rngs=nnx.Rngs(0)),
        AntialiasedDownscaler(8, 12, rngs=nnx.Rngs(0)),
        SimpleDownscaler(8, 12, rngs=nnx.Rngs(0)),
    ):
        assert scaler(x).shape == (2, 8, 8, 12)
    up = SimpleUpscaler(8, 12, rngs=nnx.Rngs(0))
    assert up(x).shape == (2, 32, 32, 12)
    bau = BilinearAdditiveUpscaler(8, 12, rngs=nnx.Rngs(0))
    assert bau(x).shape == (2, 32, 32, 12)


def test_attention_shapes():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 16), jnp.float32)
    sa = SpatialAttention(rngs=nnx.Rngs(0))(x)
    assert sa.shape == (2, 8, 8, 1)
    assert (np.asarray(sa) >= 0).all() and (np.asarray(sa) <= 1).all()
    ca = ChannelAttention(16, rngs=nnx.Rngs(0))(x)
    assert ca.shape == (2, 1, 1, 16)
    assert CBAM(16, rngs=nnx.Rngs(0))(x).shape == x.shape
    assert CrossCBAM(16, rngs=nnx.Rngs(0))(x, x).shape == x.shape


def test_transformer_layers():
    enc = TransformerEncoderLayer(32, num_heads=4, norm_first=True, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 10, 32), jnp.float32)
    assert enc(x).shape == (2, 10, 32)
    dec = TransformerDecoderLayer(32, num_heads=4, rngs=nnx.Rngs(0))
    mem = jnp.asarray(np.random.RandomState(1).rand(2, 20, 32), jnp.float32)
    assert dec(x, mem).shape == (2, 10, 32)

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers import (
    ConvNormAct,
    StandardConvNormAct,
    SeparableConv2d,
    SequentialConvBlocks,
    BlurPool2d,
    Normalize,
    PadToMultipleOf,
    MLP,
)


def test_conv_norm_act_shapes():
    x = jnp.ones((2, 16, 16, 8))
    block = ConvNormAct(8, 16, rngs=nnx.Rngs(0))
    assert block(x).shape == (2, 16, 16, 16)
    strided = ConvNormAct(8, 16, stride=2, rngs=nnx.Rngs(0))
    assert strided(x).shape == (2, 8, 8, 16)


def test_conv_norm_act_act_before_norm():
    """sihl order: conv -> act -> norm; with batchnorm in train mode the
    output is normalized, so it must contain negatives even after relu."""
    block = ConvNormAct(4, 8, act="relu", norm="batch", rngs=nnx.Rngs(0))
    block.train()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 4), jnp.float32)
    out = np.asarray(block(x))
    assert (out < 0).any()


def test_standard_conv_norm_act_nonnegative_after_relu():
    block = StandardConvNormAct(4, 8, act="relu", rngs=nnx.Rngs(0))
    block.train()
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 4), jnp.float32)
    assert (np.asarray(block(x)) >= 0).all()


def test_separable_conv():
    x = jnp.ones((2, 16, 16, 8))
    conv = SeparableConv2d(8, 24, rngs=nnx.Rngs(0))
    assert conv(x).shape == (2, 16, 16, 24)


def test_sequential_conv_blocks():
    x = jnp.ones((2, 8, 8, 4))
    blocks = SequentialConvBlocks(4, 12, num_layers=3, rngs=nnx.Rngs(0))
    assert blocks(x).shape == (2, 8, 8, 12)
    empty = SequentialConvBlocks(4, 12, num_layers=0, rngs=nnx.Rngs(0))
    assert empty(x).shape == x.shape


def test_blurpool_shape():
    x = jnp.ones((2, 16, 16, 8))
    assert BlurPool2d(8, stride=2)(x).shape == (2, 8, 8, 8)


def test_normalize():
    x = jnp.ones((1, 4, 4, 3))
    norm = Normalize([1.0, 1.0, 1.0], [2.0, 2.0, 2.0])
    assert np.allclose(np.asarray(norm(x)), 0.0)


def test_pad_to_multiple():
    x = jnp.ones((1, 10, 13, 3))
    out = PadToMultipleOf(8)(x)
    assert out.shape == (1, 16, 16, 3)


def test_mlp_final_bias():
    mlp = MLP(16, [16, 16, 1], final_bias_init=-5.0, rngs=nnx.Rngs(0))
    assert np.allclose(np.asarray(mlp.linears[-1].bias[...]), -5.0)
    out = mlp(jnp.zeros((3, 16)))
    assert out.shape == (3, 1)
    assert np.allclose(np.asarray(out), -5.0)

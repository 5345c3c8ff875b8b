"""Parity: output-mask relu (ops/relu.py) vs stock jax.nn.relu.

The custom VJP keeps the relu *output* as residual instead of the input;
values and gradients must be bit-identical (y > 0 <=> x > 0 for
y = max(x, 0), and both define grad(0) = 0).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sihl_tpu.ops.relu import relu_outmask


def test_value_and_grad_parity():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16), jnp.float32)
    # include exact zeros to pin down tie behavior
    x = x.at[0, 0, 0].set(0.0)

    y_ref = jax.nn.relu(x)
    y = relu_outmask(x)
    assert np.array_equal(np.asarray(y), np.asarray(y_ref))

    ct = jnp.asarray(rng.randn(*x.shape), jnp.float32)
    g_ref = jax.vjp(jax.nn.relu, x)[1](ct)[0]
    g = jax.vjp(relu_outmask, x)[1](ct)[0]
    assert np.array_equal(np.asarray(g), np.asarray(g_ref))


def test_grad_zero_at_zero():
    g = jax.grad(lambda x: relu_outmask(x).sum())(jnp.zeros(3))
    assert np.array_equal(np.asarray(g), np.zeros(3))


def test_bf16_and_vmap():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 5), jnp.bfloat16)
    y = jax.vmap(relu_outmask)(x)
    assert np.array_equal(
        np.asarray(y, np.float32), np.asarray(jax.nn.relu(x), np.float32)
    )


def test_chain_grad_parity_through_bn():
    """conv-BN-relu chain: grads through relu_outmask match stock.

    Builds both legs explicitly (relu_outmask vs jax.nn.relu on the same
    conv+BN prefix) — the _ACTS['relu'] lookup resolves to stock relu
    unless the env gate was set at import time, so relying on the block's
    own activation would compare the stock path against itself.
    """
    from flax import nnx

    import sihl_tpu
    from sihl_tpu.layers.convblocks import StandardConvNormAct

    sihl_tpu.set_compute_dtype(jnp.float32)
    block = StandardConvNormAct(8, 16, 3, rngs=nnx.Rngs(0))
    graphdef, state = nnx.split(block)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 8), jnp.float32)

    def loss_custom(state, x):
        m = nnx.merge(graphdef, state)
        m.train()
        y = m.norm(m.conv(x))
        return (relu_outmask(y) ** 2).sum()

    def loss_stock(state, x):
        m = nnx.merge(graphdef, state)
        m.train()
        y = m.norm(m.conv(x))
        return (jax.nn.relu(y) ** 2).sum()

    g1 = jax.grad(loss_custom)(state, x)
    g2 = jax.grad(loss_stock)(state, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

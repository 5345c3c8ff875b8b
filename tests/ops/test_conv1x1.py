"""Parity: DotBackwardConv's custom VJP vs stock nnx.Conv autodiff.

The dot-backward lowering must be a pure performance choice — forward
bit-identical (same lax.conv call), backward equal up to f32 reduction
order (tolerance) for both wrt-input and wrt-filter, and ineligible
configurations must fall back to the stock path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sihl_tpu.ops import conv1x1 as c11


@pytest.fixture(autouse=True)
def _force_enable(monkeypatch):
    # Default is OFF after the measured on-chip loss (module docstring);
    # the parity contract must still hold for opt-in users.
    monkeypatch.setattr(c11, "_ENABLED", True)


def _pair(k=1, stride=1, groups=1, use_bias=True, cin=6, cout=10):
    kwargs = dict(
        kernel_size=(k, k),
        strides=stride,
        padding=[((k - 1) // 2,) * 2] * 2,
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    a = nnx.Conv(cin, cout, rngs=nnx.Rngs(0), **kwargs)
    b = c11.DotBackwardConv(cin, cout, rngs=nnx.Rngs(0), **kwargs)
    return a, b


def _loss_grads(conv, x):
    graphdef, params, rest = nnx.split(conv, nnx.Param, ...)

    def loss(params, x):
        m = nnx.merge(graphdef, params, rest)
        y = m(x)
        return (jnp.sin(y) * jnp.arange(1, y.size + 1).reshape(y.shape)).sum()

    dp, dx = jax.grad(loss, argnums=(0, 1))(params, x)
    return dx, dp


@pytest.mark.parametrize("use_bias", [True, False])
def test_conv1x1_matches_stock(use_bias):
    a, b = _pair(use_bias=use_bias)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 6), jnp.float32)
    np.testing.assert_allclose(np.asarray(a(x)), np.asarray(b(x)), rtol=2e-6)
    dxa, dpa = _loss_grads(a, x)
    dxb, dpb = _loss_grads(b, x)
    np.testing.assert_allclose(np.asarray(dxa), np.asarray(dxb), rtol=1e-5, atol=1e-5)
    flat_a = jax.tree_util.tree_leaves(dpa)
    flat_b = jax.tree_util.tree_leaves(dpb)
    assert len(flat_a) == len(flat_b)
    for ga, gb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,stride,groups", [(3, 1, 1), (1, 2, 1), (1, 1, 2)])
def test_ineligible_falls_back(k, stride, groups):
    cin, cout = 6, 10
    if groups > 1:
        cin = cout = 8
    a, b = _pair(k=k, stride=stride, groups=groups, cin=cin, cout=cout)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, cin), jnp.float32)
    # fallback must be bit-identical (same stock code path)
    np.testing.assert_array_equal(np.asarray(a(x)), np.asarray(b(x)))
    dxa, dpa = _loss_grads(a, x)
    dxb, dpb = _loss_grads(b, x)
    np.testing.assert_array_equal(np.asarray(dxa), np.asarray(dxb))


def test_bf16_compute_dtype():
    kwargs = dict(
        kernel_size=(1, 1), strides=1, padding=[(0, 0), (0, 0)],
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
    )
    a = nnx.Conv(6, 10, rngs=nnx.Rngs(0), **kwargs)
    b = c11.DotBackwardConv(6, 10, rngs=nnx.Rngs(0), **kwargs)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 6), jnp.float32)
    ya, yb = np.asarray(a(x), np.float32), np.asarray(b(x), np.float32)
    np.testing.assert_allclose(ya, yb, rtol=2e-2, atol=2e-2)
    assert a(x).dtype == b(x).dtype == jnp.bfloat16

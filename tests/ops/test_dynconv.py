"""Parity tests for the fused dynamic-decode kernel (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sihl_tpu.ops.pallas import dynconv


def _inputs(b=2, i=5, h=8, w=8, c=8, k=1, seed=0):
    rng = np.random.RandomState(seed)
    mf = jnp.asarray(rng.randn(b, h, w, c) * 0.5, jnp.float32)
    grid = jnp.asarray(rng.rand(h, w, 2), jnp.float32)
    centers = jnp.asarray(rng.rand(b, i, 2), jnp.float32)
    dyn = jnp.asarray(rng.randn(b, i, dynconv.param_count(c, k)) * 0.3, jnp.float32)
    return mf, grid, centers, dyn


@pytest.mark.parametrize("c,k,i", [(8, 1, 5), (32, 17, 3), (8, 1, 16), (8, 3, 4)])
def test_forward_parity(c, k, i):
    mf, grid, centers, dyn = _inputs(i=i, c=c, k=k)
    ref = dynconv.reference_decode(mf, grid, centers, dyn, c, k)
    got = dynconv._decode(mf, grid, centers, dyn, c, k, True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("c,k", [(8, 1), (32, 17)])
def test_gradient_parity(c, k):
    mf, grid, centers, dyn = _inputs(i=4, c=c, k=k, seed=3)
    w = jnp.asarray(np.random.RandomState(9).randn(*dynconv.reference_decode(
        mf, grid, centers, dyn, c, k).shape), jnp.float32)

    def loss_ref(mf_, dyn_):
        return jnp.sum(jnp.tanh(dynconv.reference_decode(mf_, grid, centers, dyn_, c, k)) * w)

    def loss_fused(mf_, dyn_):
        return jnp.sum(jnp.tanh(dynconv._decode(mf_, grid, centers, dyn_, c, k, True)) * w)

    (lr, (gr_mf, gr_dyn)) = jax.value_and_grad(loss_ref, argnums=(0, 1))(mf, dyn)
    (lf, (gf_mf, gf_dyn)) = jax.value_and_grad(loss_fused, argnums=(0, 1))(mf, dyn)
    assert abs(float(lr) - float(lf)) < 1e-3 * max(abs(float(lr)), 1.0)
    np.testing.assert_allclose(np.asarray(gf_mf), np.asarray(gr_mf), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gf_dyn), np.asarray(gr_dyn), atol=2e-3, rtol=2e-3)

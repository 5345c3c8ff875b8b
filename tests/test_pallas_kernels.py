"""Parity tests for the Pallas multiscale-fusion kernels (interpreter
mode on CPU vs the pure-JAX reference paths)."""

import numpy as np
import jax.numpy as jnp

from sihl_tpu.ops.pallas.fusion import fused_upsample_add, fused_weighted_sum


def test_fused_upsample_add_parity():
    rng = np.random.RandomState(0)
    top = jnp.asarray(rng.rand(2, 4, 8, 128), jnp.float32)
    lateral = jnp.asarray(rng.rand(2, 8, 16, 128), jnp.float32)
    ref = np.asarray(fused_upsample_add(top, lateral, use_pallas=False))
    ker = np.asarray(fused_upsample_add(top, lateral, use_pallas=True, interpret=True))
    np.testing.assert_allclose(ker, ref, atol=1e-6)


def test_fused_upsample_add_fallback_unaligned():
    rng = np.random.RandomState(1)
    top = jnp.asarray(rng.rand(1, 2, 3, 5), jnp.float32)  # unaligned channels
    lateral = jnp.asarray(rng.rand(1, 4, 6, 5), jnp.float32)
    out = np.asarray(fused_upsample_add(top, lateral))
    expected = np.repeat(np.repeat(np.asarray(top), 2, 1), 2, 2) + np.asarray(lateral)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_fused_weighted_sum_parity():
    rng = np.random.RandomState(2)
    inputs = [jnp.asarray(rng.rand(2, 4, 8, 128), jnp.float32) for _ in range(3)]
    weights = jnp.asarray([0.2, 0.5, 0.3], jnp.float32)
    ref = np.asarray(fused_weighted_sum(weights, inputs, use_pallas=False))
    ker = np.asarray(fused_weighted_sum(weights, inputs, use_pallas=True, interpret=True))
    np.testing.assert_allclose(ker, ref, atol=1e-6)


def test_fused_upsample_add_grad():
    import jax

    rng = np.random.RandomState(3)
    top = jnp.asarray(rng.rand(1, 2, 4, 128), jnp.float32)
    lateral = jnp.asarray(rng.rand(1, 4, 8, 128), jnp.float32)

    def loss_k(t, l):
        return jnp.sum(fused_upsample_add(t, l, use_pallas=True, interpret=True) ** 2)

    def loss_ref(t, l):
        return jnp.sum(fused_upsample_add(t, l, use_pallas=False) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(top, lateral)
    gr = jax.grad(loss_ref, argnums=(0, 1))(top, lateral)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_weighted_sum_grad():
    import jax

    rng = np.random.RandomState(4)
    inputs = tuple(jnp.asarray(rng.rand(1, 2, 8, 128), jnp.float32) for _ in range(2))
    weights = jnp.asarray([0.7, 0.3], jnp.float32)

    def loss(w, xs, use):
        return jnp.sum(fused_weighted_sum(w, xs, use_pallas=use, interpret=use) ** 2)

    gk = jax.grad(loss, argnums=(0, 1))(weights, inputs, True)
    gr = jax.grad(loss, argnums=(0, 1))(weights, inputs, False)
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

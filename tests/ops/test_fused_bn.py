"""Parity tests for the fused-backward training BatchNorm (ops/fused_bn.py).

The fused path must be bit-identical to ``nnx.BatchNorm`` in the forward
(same op sequence) and match its autodiff gradients to f32 tolerance
(the custom backward accumulates the stat sums in f32; stock autodiff
accumulates them in the compute dtype, so bf16 runs are compared against
an f32 oracle rather than bit-for-bit).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sihl_tpu.ops.fused_bn import FusedBatchNorm


def _pair(dtype, param_dtype=jnp.float32):
    kw = dict(
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        param_dtype=param_dtype,
        rngs=nnx.Rngs(0),
    )
    ref = nnx.BatchNorm(8, **kw)
    fused = FusedBatchNorm(8, **kw)
    # non-trivial affine params, shared
    scale = jnp.asarray(np.random.RandomState(1).randn(8), param_dtype)
    bias = jnp.asarray(np.random.RandomState(2).randn(8), param_dtype)
    for m in (ref, fused):
        m.scale[...] = scale
        m.bias[...] = bias
        m.train()
    return ref, fused


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_bit_identical(dtype):
    ref, fused = _pair(dtype)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 6, 8), dtype)
    y_ref = ref(x)
    y_fused = fused(x)
    assert y_fused.dtype == y_ref.dtype
    np.testing.assert_array_equal(np.asarray(y_fused), np.asarray(y_ref))
    # running stats advanced identically
    np.testing.assert_allclose(
        np.asarray(fused.mean[...]), np.asarray(ref.mean[...]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(fused.var[...]), np.asarray(ref.var[...]), rtol=1e-6
    )


def _grads(module, x, dy):
    def f(m, x):
        return (m(x) * dy).sum()

    g_params, gx = nnx.grad(f, argnums=(nnx.DiffState(0, nnx.Param), 1))(
        module, x
    )
    return g_params, gx


def test_gradients_match_autodiff_f32():
    ref, fused = _pair(jnp.float32)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    dy = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    (g_ref, gx_ref) = _grads(ref, x, dy)
    (g_fused, gx_fused) = _grads(fused, x, dy)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(g_fused["scale"][...]),
        np.asarray(g_ref["scale"][...]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_fused["bias"][...]),
        np.asarray(g_ref["bias"][...]),
        atol=2e-5,
    )


def test_gradients_bf16_match_f32_oracle():
    """bf16 fused grads must sit within bf16 rounding of the f32 oracle —
    the custom backward's f32 accumulation may legitimately BEAT stock
    bf16 autodiff, so the oracle is the f32 reference, not bitwise bf16."""
    ref32, _ = _pair(jnp.float32)
    _, fused16 = _pair(jnp.bfloat16)
    rng = np.random.RandomState(4)
    x32 = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    dy32 = jnp.asarray(rng.randn(2, 6, 6, 8), jnp.float32)
    x16, dy16 = x32.astype(jnp.bfloat16), dy32.astype(jnp.bfloat16)
    (_, gx32) = _grads(ref32, x32, dy32)
    (_, gx16) = _grads(fused16, x16, dy16)
    np.testing.assert_allclose(
        np.asarray(gx16, np.float32), np.asarray(gx32), atol=0.05, rtol=0.05
    )


def test_eval_mode_falls_back_to_stock():
    ref, fused = _pair(jnp.float32)
    x = jnp.asarray(np.random.RandomState(5).randn(2, 6, 6, 8), jnp.float32)
    ref(x), fused(x)  # advance running stats once
    ref.eval(), fused.eval()
    np.testing.assert_array_equal(np.asarray(fused(x)), np.asarray(ref(x)))


def test_jit_scan_training_parity():
    """Under jit, fused vs stock BN training trajectories agree (f32)."""
    ref, fused = _pair(jnp.float32)
    rng = np.random.RandomState(6)
    xs = jnp.asarray(rng.randn(3, 2, 6, 6, 8), jnp.float32)

    def step(m, x):
        def loss_fn(m):
            return (m(x) ** 2).mean()

        loss, grads = nnx.value_and_grad(loss_fn)(m)
        # plain SGD on the affine params
        m.scale[...] = m.scale[...] - 0.1 * grads["scale"][...]
        m.bias[...] = m.bias[...] - 0.1 * grads["bias"][...]
        return loss

    for m in (ref, fused):
        m.train()
    for i in range(3):
        l_ref = step(ref, xs[i])
        l_fused = step(fused, xs[i])
        np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fused.scale[...]), np.asarray(ref.scale[...]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(fused.mean[...]), np.asarray(ref.mean[...]), atol=1e-6
    )

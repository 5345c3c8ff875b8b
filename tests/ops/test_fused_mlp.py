"""Parity tests for the fused dense-MLP Pallas kernel (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

import sihl_tpu
from sihl_tpu.layers.mlp import MLP
from sihl_tpu.ops.pallas import mlp as fused


@pytest.fixture
def mlps():
    sihl_tpu.set_compute_dtype(jnp.bfloat16)
    rngs = nnx.Rngs(0)
    loc = MLP(256, [256] * 4 + [1], final_bias_init=-5.0, rngs=rngs)
    iou = MLP(256, [256] * 4 + [4], rngs=rngs)
    yield loc, iou
    sihl_tpu.set_compute_dtype(jnp.float32)


def _ref(mlps_, x):
    return [m(x) for m in mlps_]


def test_forward_parity(mlps):
    loc, iou = mlps
    x = jnp.asarray(np.random.RandomState(0).randn(512, 256), jnp.bfloat16)
    ref = _ref([loc, iou], x)
    got = fused.fused_mlps(x, [loc, iou], interpret=True)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32), atol=5e-2, rtol=5e-2
        )


def test_forward_parity_padded_rows(mlps):
    loc, iou = mlps
    x = jnp.asarray(np.random.RandomState(1).randn(333, 256), jnp.bfloat16)
    ref = _ref([loc, iou], x)
    got = fused.fused_mlps(x, [loc, iou], interpret=True)
    assert got[0].shape == (333, 1) and got[1].shape == (333, 4)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(g, np.float32), atol=5e-2, rtol=5e-2
        )


def test_gradient_parity(mlps):
    loc, iou = mlps
    graphdef, state = nnx.split((loc, iou))
    x = jnp.asarray(np.random.RandomState(2).randn(256, 256), jnp.bfloat16)
    wloc = jnp.asarray(np.random.RandomState(3).randn(256, 1), jnp.float32)
    wiou = jnp.asarray(np.random.RandomState(4).randn(256, 4), jnp.float32)

    def loss_ref(st, xx):
        l, i = nnx.merge(graphdef, st)
        a, b = _ref([l, i], xx)
        return (
            jnp.sum(a.astype(jnp.float32) * wloc)
            + jnp.sum(jnp.tanh(b.astype(jnp.float32)) * wiou)
        )

    def loss_fused(st, xx):
        l, i = nnx.merge(graphdef, st)
        a, b = fused.fused_mlps(xx, [l, i], interpret=True)
        return (
            jnp.sum(a.astype(jnp.float32) * wloc)
            + jnp.sum(jnp.tanh(b.astype(jnp.float32)) * wiou)
        )

    (lr, gr_x), gr_p = jax.value_and_grad(loss_ref, argnums=(1,), has_aux=False)(
        state, x
    ), jax.grad(loss_ref, argnums=0)(state, x)
    (lf, gf_x), gf_p = jax.value_and_grad(loss_fused, argnums=(1,), has_aux=False)(
        state, x
    ), jax.grad(loss_fused, argnums=0)(state, x)

    assert abs(float(lr) - float(lf)) / (abs(float(lr)) + 1e-6) < 5e-2
    np.testing.assert_allclose(
        np.asarray(gr_x[0], np.float32),
        np.asarray(gf_x[0], np.float32),
        atol=1e-1,
        rtol=1e-1,
    )
    ref_leaves = jax.tree_util.tree_leaves(gr_p)
    fused_leaves = jax.tree_util.tree_leaves(gf_p)
    assert len(ref_leaves) == len(fused_leaves)
    for a, b in zip(ref_leaves, fused_leaves):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.1, (a.shape, np.abs(a - b).max(), denom)

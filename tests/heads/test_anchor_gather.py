"""Parity for the flat-row anchor gather (heads/anchors.py) and the
conv→BN fusion-split barrier (layers/convblocks.py) — both are pure
layout/scheduling levers and must be bit-identical to the baseline ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sihl_tpu.heads import anchors as anchor_lib


def _flat_gather_reference(feats, idx):
    return jnp.take_along_axis(feats, idx[..., None], axis=1)


@pytest.mark.parametrize("b,a,c,k", [(4, 50, 8, 7), (2, 136, 16, 136), (1, 9, 4, 1)])
def test_gather_anchor_rows_matches_take_along_axis(monkeypatch, b, a, c, k):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.rand(b, a, c), jnp.float32)
    idx = jnp.asarray(rng.randint(0, a, (b, k)), jnp.int32)
    monkeypatch.setattr(anchor_lib, "_FLAT_GATHER", True)
    got = anchor_lib.gather_anchor_rows(feats, idx)
    assert jnp.array_equal(got, _flat_gather_reference(feats, idx))
    monkeypatch.setattr(anchor_lib, "_FLAT_GATHER", False)
    got = anchor_lib.gather_anchor_rows(feats, idx)
    assert jnp.array_equal(got, _flat_gather_reference(feats, idx))


def test_gather_anchor_rows_grad_parity(monkeypatch):
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.rand(3, 40, 8), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 40, (3, 5)), jnp.int32)

    def loss_via(fn):
        return jax.grad(lambda f: jnp.sum(jnp.sin(fn(f, idx))))(feats)

    monkeypatch.setattr(anchor_lib, "_FLAT_GATHER", True)
    g_flat = loss_via(anchor_lib.gather_anchor_rows)
    g_ref = loss_via(_flat_gather_reference)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_ref), rtol=0, atol=0)


def test_bn_split_barrier_is_identity(monkeypatch):
    from sihl_tpu.layers import convblocks

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 8, 8, 4), jnp.float32)
    monkeypatch.setattr(convblocks, "_BN_SPLIT", 1)
    split = convblocks.maybe_split_norm_input(x)
    monkeypatch.setattr(convblocks, "_BN_SPLIT", 0)
    plain = convblocks.maybe_split_norm_input(x)
    assert jnp.array_equal(split, plain)


def test_bn_split_spatial_scoping(monkeypatch):
    """SIHL_TPU_BN_SPLIT=N (N>1) barriers only tensors whose max spatial
    dim is >= N; smaller maps and non-4D inputs pass through unbarriered
    (checked via the jaxpr — values are identical either way)."""
    from sihl_tpu.layers import convblocks

    def has_barrier(fn, x):
        # fresh lambda per call: jax caches traces by function identity,
        # which would mask the monkeypatched _BN_SPLIT
        return "optimization_barrier" in str(jax.make_jaxpr(lambda v: fn(v))(x))

    big = jnp.zeros((1, 160, 160, 4), jnp.float32)
    small = jnp.zeros((1, 40, 40, 4), jnp.float32)
    flat = jnp.zeros((7, 4), jnp.float32)
    monkeypatch.setattr(convblocks, "_BN_SPLIT", 80)
    assert has_barrier(convblocks.maybe_split_norm_input, big)
    assert not has_barrier(convblocks.maybe_split_norm_input, small)
    assert not has_barrier(convblocks.maybe_split_norm_input, flat)
    assert jnp.array_equal(convblocks.maybe_split_norm_input(big), big)
    monkeypatch.setattr(convblocks, "_BN_SPLIT", 0)
    assert not has_barrier(convblocks.maybe_split_norm_input, big)


def test_sort_positives_preserves_pairs_and_sorts():
    import jax.numpy as jnp
    import numpy as np
    from sihl_tpu.heads.anchors import sort_positives

    rng = np.random.RandomState(0)
    idx = np.stack([rng.permutation(100)[:7] for _ in range(3)])
    w = rng.rand(3, 7).astype(np.float32)
    w2, idx2 = sort_positives(jnp.asarray(w), jnp.asarray(idx))
    w2, idx2 = np.asarray(w2), np.asarray(idx2)
    for b in range(3):
        assert (np.diff(idx2[b]) > 0).all()
        assert dict(zip(idx[b], w[b])) == dict(zip(idx2[b], w2[b]))


def test_gather_anchor_rows_sorted_unique_parity():
    import jax.numpy as jnp
    import numpy as np
    from sihl_tpu.heads.anchors import gather_anchor_rows

    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 50, 8), jnp.float32)
    idx = jnp.asarray(np.sort(np.stack([rng.permutation(50)[:5] for _ in range(2)]), axis=1))
    a = gather_anchor_rows(feats, idx)
    b = gather_anchor_rows(feats, idx, sorted_unique=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # backward (scatter-add transpose) parity
    import jax

    g1 = jax.grad(lambda f: (gather_anchor_rows(f, idx) ** 2).sum())(feats)
    g2 = jax.grad(
        lambda f: (gather_anchor_rows(f, idx, sorted_unique=True) ** 2).sum()
    )(feats)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

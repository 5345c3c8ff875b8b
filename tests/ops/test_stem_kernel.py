"""Parity tests for the fused stem conv+stats Pallas kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sihl_tpu.ops.pallas.stem import (
    _remap_kernel,
    stem_conv_stats,
    supported,
)


def _ref(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))


@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize("size", [32, 64])
def test_stem_conv_stats_matches_xla_conv(rng, c, size):
    x = jnp.asarray(rng.randn(2, size, size, c), jnp.float32)
    w = jnp.asarray(rng.randn(7, 7, c, 64) * 0.1, jnp.float32)
    assert supported(x.shape, w.shape)
    y, s, q = stem_conv_stats(x, w, interpret=True)
    ry, rs, rq = _ref(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ry), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(rs), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q), np.asarray(rq), rtol=1e-5, atol=1e-2)


def test_stem_conv_stats_bf16_rounding_matches_bn_input(rng):
    """Stats are sums of the bf16-ROUNDED conv output — what BatchNorm sees."""
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.bfloat16)
    y, s, q = stem_conv_stats(x, w, interpret=True)
    assert y.dtype == jnp.bfloat16
    yf = np.asarray(y, np.float32)
    np.testing.assert_allclose(np.asarray(s), yf.sum((0, 1, 2)), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(q), (yf * yf).sum((0, 1, 2)), rtol=1e-5, atol=1e-2
    )


def test_supported_gates():
    w = (7, 7, 3, 64)
    assert supported((2, 64, 64, 3), w)
    assert not supported((2, 63, 64, 3), w)  # odd H
    assert not supported((2, 64, 64, 4), w)  # channel mismatch
    assert not supported((2, 64, 64, 3), (5, 5, 3, 64))  # wrong kernel
    assert not supported((2, 64, 64, 3), (7, 7, 3, 60))  # CO not /8


def test_remap_kernel_layout():
    """Patch column (ky, u, v) maps to tap (ky, 2u + v//C, v%C); kx=7 is zero."""
    c, co = 3, 8
    w = jnp.arange(7 * 7 * c * co, dtype=jnp.float32).reshape(7, 7, c, co)
    wk = np.asarray(_remap_kernel(w))
    assert wk.shape == (7 * 4 * 2 * c, co)
    for ky in range(7):
        for u in range(4):
            for v in range(2 * c):
                kx = 2 * u + v // c
                row = wk[ky * 8 * c + u * 2 * c + v]
                if kx < 7:
                    np.testing.assert_array_equal(row, np.asarray(w[ky, kx, v % c]))
                else:
                    np.testing.assert_array_equal(row, 0.0)

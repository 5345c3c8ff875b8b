"""Parity for the fused row k-th-largest kernel (interpreter mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sihl_tpu.ops.pallas.topk import _row_reference, _rows_pallas


@pytest.mark.parametrize("g,a", [(100, 8525), (7, 130), (8, 128), (1, 9)])
def test_kernel_matches_reference(g, a):
    x = jnp.asarray(
        np.abs(np.random.RandomState(0).randn(g, a)).astype(np.float32)
    )
    ref_best, ref_kth = _row_reference(x, 9)
    got_best, got_kth = _rows_pallas(x, 9, interpret=True)
    np.testing.assert_allclose(np.asarray(got_best), np.asarray(ref_best))
    np.testing.assert_allclose(np.asarray(got_kth), np.asarray(ref_kth))


def test_kernel_with_ties_and_zeros():
    x = jnp.asarray(
        np.random.RandomState(1).choice([0.0, 0.25, 0.5, 0.5, 1.0], (16, 257))
        .astype(np.float32)
    )
    ref = _row_reference(x, 9)
    got = _rows_pallas(x, 9, interpret=True)
    for r, g_ in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(r))

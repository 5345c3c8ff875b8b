"""Fused multiscale-fusion Pallas kernels.

The FPN/BiFPN/PAN top-down step is ``upsample2x(top) + lateral`` — two
HBM-bound elementwise passes if unfused.  :func:`fused_upsample_add` does
the broadcast-upsample and add in one VMEM pass: each grid step reads one
row-block of the coarse map and the matching two row-blocks of the fine
map and writes two fused output rows, so the upsampled intermediate never
exists in HBM.

:func:`fused_weighted_sum` fuses BiFPN's FastNormalizedFusion — softmax
weights times N feature maps summed — into a single pass (reference
``src/sihl/layers/bifpn.py:10-17``).

Both engage automatically on TPU for aligned shapes and fall back to
pure JAX otherwise (`use_pallas` forces either way; tests run the kernels
in interpreter mode).
"""

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


# -- upsample2x + add -------------------------------------------------------


def _upsample_add_kernel(top_ref, lateral_ref, out_ref):
    # top block: (1, 1, w, C); lateral/out block: (1, 2, 2w, C)
    top = top_ref[0, 0]  # (w, C)
    w, c = top.shape
    wide = jnp.broadcast_to(top[:, None, :], (w, 2, c)).reshape(2 * w, c)
    out_ref[0, 0] = lateral_ref[0, 0] + wide
    out_ref[0, 1] = lateral_ref[0, 1] + wide


def _upsample_add_pallas(top: jnp.ndarray, lateral: jnp.ndarray, interpret: bool):
    b, h, w, c = top.shape
    grid = (b, h)
    return pl.pallas_call(
        _upsample_add_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 2, 2 * w, c), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, 2 * w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(lateral.shape, lateral.dtype),
        interpret=interpret,
    )(top, lateral)


def fused_upsample_add(
    top: jnp.ndarray,
    lateral: jnp.ndarray,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``upsample2x_nearest(top) + lateral`` in one fused pass.

    top: (B, h, w, C); lateral: (B, 2h, 2w, C).
    """
    b, h, w, c = top.shape
    assert lateral.shape == (b, 2 * h, 2 * w, c), (top.shape, lateral.shape)
    eligible = _HAS_PLTPU and c % 128 == 0 and (2 * w) % 8 == 0
    if use_pallas is None:
        use_pallas = eligible and _on_tpu()
    if use_pallas and (eligible or interpret):
        return _upsample_add_pallas(top, lateral.astype(top.dtype), interpret)
    # pure-JAX reference (XLA fuses this reasonably too)
    wide = jnp.broadcast_to(
        top[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)
    return wide + lateral


# -- softmax-weighted feature fusion ---------------------------------------


def _weighted_sum_kernel(weights_ref, *refs):
    *in_refs, out_ref = refs
    acc = in_refs[0][...] * weights_ref[0, 0]
    for i, ref in enumerate(in_refs[1:], start=1):
        acc += ref[...] * weights_ref[0, i]
    out_ref[...] = acc


def _weighted_sum_pallas(weights, inputs, interpret: bool):
    b, h, w, c = inputs[0].shape
    n = len(inputs)
    grid = (b, h)
    weights2d = weights.reshape(1, n).astype(inputs[0].dtype)
    in_specs = [pl.BlockSpec((1, n), lambda i, j: (0, 0))] + [
        pl.BlockSpec((1, 1, w, c), lambda i, j: (i, j, 0, 0)) for _ in inputs
    ]
    return pl.pallas_call(
        _weighted_sum_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(inputs[0].shape, inputs[0].dtype),
        interpret=interpret,
    )(weights2d, *inputs)


def fused_weighted_sum(
    weights: jnp.ndarray,
    inputs: Sequence[jnp.ndarray],
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``sum_i weights[i] * inputs[i]`` over same-shape NHWC maps."""
    inputs = list(inputs)
    c = inputs[0].shape[-1]
    eligible = _HAS_PLTPU and c % 128 == 0 and inputs[0].shape[2] % 8 == 0
    if use_pallas is None:
        use_pallas = eligible and _on_tpu()
    if use_pallas and (eligible or interpret):
        return _weighted_sum_pallas(weights, inputs, interpret)
    weights = weights.astype(inputs[0].dtype)
    out = weights[0] * inputs[0]
    for w_i, x in zip(weights[1:], inputs[1:]):
        out = out + w_i * x
    return out

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
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def _kernels_enabled() -> bool:
    return os.environ.get("SIHL_TPU_PALLAS", "0") == "1"


def _on_tpu() -> bool:
    try:
        return _kernels_enabled() and jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


# -- upsample2x + add -------------------------------------------------------


def _upsample_add_kernel(top_ref, lateral_ref, out_ref):
    # top block: (1, R, w, C); lateral/out block: (1, 2R, 2w, C)
    top = top_ref[0]  # (R, w, C)
    r, w, c = top.shape
    # nearest 2x in both dims: (R, w, C) -> (2R, 2w, C)
    wide = jnp.broadcast_to(top[:, None, :, None, :], (r, 2, w, 2, c))
    wide = wide.reshape(2 * r, 2 * w, c)
    out_ref[0] = lateral_ref[0] + wide


def _upsample_add_pallas(top: jnp.ndarray, lateral: jnp.ndarray, interpret: bool):
    b, h, w, c = top.shape
    # multi-row blocks amortize DMA setup; rows per step picked so a block
    # is a few hundred KB of VMEM
    rows = 1
    for cand in (16, 8, 4, 2):
        if h % cand == 0 and 2 * cand * 2 * w * c * lateral.dtype.itemsize <= 2**21:
            rows = cand
            break
    grid = (b, h // rows)
    return pl.pallas_call(
        _upsample_add_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, w, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 2 * rows, 2 * w, c), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * rows, 2 * w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(lateral.shape, lateral.dtype),
        interpret=interpret,
    )(top, lateral)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _upsample_add(top, lateral, use_kernel: bool, interpret: bool):
    if use_kernel:
        return _upsample_add_pallas(top, lateral.astype(top.dtype), interpret)
    b, h, w, c = top.shape
    wide = jnp.broadcast_to(
        top[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)
    return wide + lateral


def _upsample_add_fwd(top, lateral, use_kernel, interpret):
    return _upsample_add(top, lateral, use_kernel, interpret), None


def _upsample_add_bwd(use_kernel, interpret, _, g):
    b, h2, w2, c = g.shape
    d_top = jnp.sum(g.reshape(b, h2 // 2, 2, w2 // 2, 2, c), axis=(2, 4))
    return d_top.astype(g.dtype), g


_upsample_add.defvjp(_upsample_add_fwd, _upsample_add_bwd)


def fused_upsample_add(
    top: jnp.ndarray,
    lateral: jnp.ndarray,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``upsample2x_nearest(top) + lateral`` in one fused pass.

    top: (B, h, w, C); lateral: (B, 2h, 2w, C).  Differentiable via a
    custom VJP (the backward reduces the cotangent over 2x2 blocks).
    """
    b, h, w, c = top.shape
    assert lateral.shape == (b, 2 * h, 2 * w, c), (top.shape, lateral.shape)
    eligible = _HAS_PLTPU and c % 128 == 0 and (2 * w) % 8 == 0
    if use_pallas is None:
        use_pallas = eligible and _on_tpu()
    use_kernel = bool(use_pallas and (eligible or interpret))
    return _upsample_add(top, lateral, use_kernel, interpret)


# -- softmax-weighted feature fusion ---------------------------------------


def _weighted_sum_kernel(weights_ref, *refs):
    # weights stay fp32: Mosaic only supports 32-bit scalar extracts
    *in_refs, out_ref = refs
    acc = in_refs[0][...].astype(jnp.float32) * weights_ref[0, 0]
    for i, ref in enumerate(in_refs[1:], start=1):
        acc += ref[...].astype(jnp.float32) * weights_ref[0, i]
    out_ref[...] = acc.astype(out_ref.dtype)


def _weighted_sum_pallas(weights, inputs, interpret: bool):
    b, h, w, c = inputs[0].shape
    n = len(inputs)
    grid = (b, h)
    weights2d = weights.reshape(1, n).astype(jnp.float32)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _weighted_sum(weights, inputs, use_kernel: bool, interpret: bool):
    if use_kernel:
        return _weighted_sum_pallas(weights, list(inputs), interpret)
    weights = weights.astype(inputs[0].dtype)
    out = weights[0] * inputs[0]
    for w_i, x in zip(weights[1:], inputs[1:]):
        out = out + w_i * x
    return out


def _weighted_sum_fwd(weights, inputs, use_kernel, interpret):
    out = _weighted_sum(weights, inputs, use_kernel, interpret)
    return out, (weights, inputs)


def _weighted_sum_bwd(use_kernel, interpret, res, g):
    weights, inputs = res
    g32 = g.astype(jnp.float32)
    d_w = jnp.stack(
        [jnp.sum(g32 * x.astype(jnp.float32)) for x in inputs]
    ).astype(weights.dtype)
    d_inputs = tuple((weights[i] * g).astype(inputs[i].dtype) for i in range(len(inputs)))
    return d_w, d_inputs


_weighted_sum.defvjp(_weighted_sum_fwd, _weighted_sum_bwd)


def fused_weighted_sum(
    weights: jnp.ndarray,
    inputs: Sequence[jnp.ndarray],
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """``sum_i weights[i] * inputs[i]`` over same-shape NHWC maps.

    Differentiable via a custom VJP.
    """
    inputs = tuple(inputs)
    c = inputs[0].shape[-1]
    eligible = _HAS_PLTPU and c % 128 == 0 and inputs[0].shape[2] % 8 == 0
    if use_pallas is None:
        use_pallas = eligible and _on_tpu()
    use_kernel = bool(use_pallas and (eligible or interpret))
    return _weighted_sum(weights, inputs, use_kernel, interpret)

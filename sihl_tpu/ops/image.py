"""Image-space ops on NHWC arrays: resize, pooling, filters.

Replaces torch ``F.interpolate`` / ``F.avg_pool2d`` / depthwise filter convs
used throughout the reference.  Everything here is shape-static and fuses
under jit.
"""

import math
from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample of (B, H, W, C).

    Equivalent to torch ``interpolate(scale_factor=2)`` (mode="nearest"),
    used by FPN/BiFPN fusion (reference ``src/sihl/layers/fpn.py:47``).
    Implemented as broadcast+reshape, which XLA lowers to a cheap copy.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def interpolate(
    x: jnp.ndarray,
    size: Optional[Tuple[int, int]] = None,
    scale: Optional[Union[int, float]] = None,
    mode: str = "nearest",
) -> jnp.ndarray:
    """Resize (B, H, W, C) to ``size`` or by ``scale`` ("nearest"/"bilinear")."""
    b, h, w, c = x.shape
    if size is None:
        assert scale is not None
        size = (int(h * scale), int(w * scale))
    if size == (h, w):
        return x
    if mode == "nearest" and size == (2 * h, 2 * w):
        return upsample2x_nearest(x)
    method = {"nearest": "nearest", "bilinear": "linear"}[mode]
    return jax.image.resize(x, (b, size[0], size[1], c), method=method)


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def avg_pool2d(
    x: jnp.ndarray,
    kernel_size: Union[int, Sequence[int]],
    stride: Optional[Union[int, Sequence[int]]] = None,
    padding: Union[int, Sequence[int]] = 0,
) -> jnp.ndarray:
    """Average pool with zero padding counted in the mean (torch default)."""
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    out = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, k[0], k[1], 1),
        (1, s[0], s[1], 1),
        [(0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)],
    )
    return (out / (k[0] * k[1])).astype(x.dtype)


def max_pool2d(
    x: jnp.ndarray,
    kernel_size: Union[int, Sequence[int]],
    stride: Optional[Union[int, Sequence[int]]] = None,
    padding: Union[int, Sequence[int]] = 0,
) -> jnp.ndarray:
    k = _pair(kernel_size)
    s = _pair(stride if stride is not None else kernel_size)
    p = _pair(padding)
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        (1, k[0], k[1], 1),
        (1, s[0], s[1], 1),
        [(0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)],
    )


def adaptive_avg_pool(x: jnp.ndarray, output_size: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    """Adaptive average pool of (B, H, W, C) to (B, oh, ow, C).

    Exact for evenly-divisible sizes (the only cases the reference hits);
    falls back to resize-style binning otherwise.
    """
    oh, ow = _pair(output_size)
    b, h, w, c = x.shape
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if h % oh == 0 and w % ow == 0:
        return jnp.mean(x.reshape(b, oh, h // oh, ow, w // ow, c), axis=(2, 4))
    return jax.image.resize(x, (b, oh, ow, c), method="linear")


def adaptive_max_pool(x: jnp.ndarray, output_size: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    oh, ow = _pair(output_size)
    b, h, w, c = x.shape
    if oh == 1 and ow == 1:
        return jnp.max(x, axis=(1, 2), keepdims=True)
    assert h % oh == 0 and w % ow == 0
    return jnp.max(x.reshape(b, oh, h // oh, ow, w // ow, c), axis=(2, 4))


def _depthwise_conv(
    x: jnp.ndarray, kernel_hw: jnp.ndarray, stride: int = 1
) -> jnp.ndarray:
    """Depthwise conv of NHWC ``x`` with a single shared (kh, kw) kernel."""
    c = x.shape[-1]
    kh, kw = kernel_hw.shape
    kernel = jnp.broadcast_to(kernel_hw[:, :, None, None], (kh, kw, 1, c))
    return jax.lax.conv_general_dilated(
        x.astype(kernel.dtype),
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def blur_pool_2d(x: jnp.ndarray, kernel_size: int = 3, stride: int = 1) -> jnp.ndarray:
    """Antialiased (binomial-kernel) blur-pool with reflect padding.

    Parity: reference ``src/sihl/layers/pooling.py:7-26`` — kernel from
    ``poly1d((0.5, 0.5)) ** (k-1)``, reflect pad, depthwise strided conv.
    """
    coeffs = np.poly1d((0.5, 0.5)) ** (kernel_size - 1)
    k1 = jnp.asarray(coeffs.coeffs.astype(np.float32))
    kernel = k1[:, None] * k1[None, :]
    pad = ((stride - 1) + (kernel_size - 1)) // 2
    xp = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
    return _depthwise_conv(xp, kernel, stride=stride).astype(x.dtype)


def edges(x: jnp.ndarray) -> jnp.ndarray:
    """Sobel edge magnitude, normalized by its global max (reference ``utils:155-168``)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=jnp.float32)
    ky = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=jnp.float32)
    xp = jnp.pad(x.astype(jnp.float32), [(0, 0), (1, 1), (1, 1), (0, 0)])
    ex = _depthwise_conv(xp, kx)
    ey = _depthwise_conv(xp, ky)
    mag = jnp.sqrt(ex**2 + ey**2)
    return (mag / (jnp.max(mag) + 1e-12)).astype(x.dtype)


def gaussian_blur(
    x: jnp.ndarray, kernel_size: int = 5, sigma: Optional[float] = None
) -> jnp.ndarray:
    """Depthwise Gaussian blur with zero padding (reference ``utils:171-181``)."""
    sigma = sigma or (0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8)
    half = kernel_size // 2
    coords = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k1 = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    k1 = k1 / jnp.sum(k1)
    kernel = k1[:, None] * k1[None, :]
    xp = jnp.pad(
        x.astype(jnp.float32), [(0, 0), (half, half), (half, half), (0, 0)]
    )
    return _depthwise_conv(xp, kernel).astype(x.dtype)


def packbits_last(x: jnp.ndarray) -> jnp.ndarray:
    """Pack a boolean array's last axis into uint8 bits (little-endian bit
    order) ON DEVICE, so binary masks cross the device->host boundary at
    1/8th the bytes during validation.  Host-side inverse:
    ``np.unpackbits(arr, axis=-1, bitorder="little")[..., :w]``."""
    w = x.shape[-1]
    pad = (-w) % 8
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    x = x.reshape(x.shape[:-1] + ((w + pad) // 8, 8)).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(x * weights, axis=-1).astype(jnp.uint8)

"""General utilities (parity with reference ``src/sihl/utils/__init__.py``).

The geometry/embedding/loss helpers live in :mod:`sihl_tpu.ops`; this module
keeps the stateful/host-side helpers and re-exports the rest so the public
surface matches the reference.
"""

import functools
import random
from typing import Any, Callable, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from sihl_tpu.ops import (  # noqa: F401  (public API parity re-exports)
    coordinate_grid,
    sine_embedding_1d,
    sine_embedding_2d,
    sine_embedding_2d_grid,
    points_to_bbox,
    edges,
    gaussian_blur,
    ssim_loss,
    focal_loss,
    tversky_loss,
)
from sihl_tpu.utils.polygon_iou import polygon_iou  # noqa: F401
from sihl_tpu.utils.pck import PercentageOfCorrectKeypoints  # noqa: F401
from sihl_tpu.utils.f1 import OptimalF1Threshold  # noqa: F401

EPS = 1e-5


class BatchedMeanVarianceAccumulator:
    """Welford online mean/variance over batches (reference ``utils:23-58``).

    Works on any array backend; values are kept as jnp arrays.  A functional
    ``(state, update, compute)`` form for use inside jit lives in
    :func:`welford_init` / :func:`welford_update` / :func:`welford_compute`.
    """

    def __init__(self):
        self.count = 0
        self.mean = None
        self.m2 = None

    def update(self, x) -> None:
        x = jnp.asarray(x)
        if self.mean is None:
            self.mean = jnp.mean(x, axis=0)
            self.m2 = jnp.zeros_like(self.mean)
        else:
            if x.shape[1:] != self.mean.shape:
                raise ValueError(
                    f"Shape mismatch: got {x.shape[1:]}, expected {self.mean.shape}"
                )
            batch_count = x.shape[0]
            total = self.count + batch_count
            batch_mean = jnp.mean(x, axis=0)
            delta = batch_mean - self.mean
            self.mean = self.mean + delta * batch_count / total
            self.m2 = self.m2 + (
                jnp.var(x, axis=0) * batch_count
                + delta**2 * self.count * batch_count / total
            )
        self.count += x.shape[0]

    def compute(self):
        if self.count < 2:
            return self.mean, jnp.full_like(self.mean, jnp.nan)
        return self.mean, self.m2 / (self.count - 1)


def welford_init(shape, dtype=jnp.float32):
    """Functional Welford state: (count, mean, m2) — jit/scan friendly."""
    return (
        jnp.zeros((), jnp.float32),
        jnp.zeros(shape, dtype),
        jnp.zeros(shape, dtype),
    )


def welford_update(state, x):
    count, mean, m2 = state
    batch_count = x.shape[0]
    total = count + batch_count
    batch_mean = jnp.mean(x, axis=0)
    delta = batch_mean - mean
    # first update: when count == 0, mean <- batch_mean and m2 <- 0 exactly
    new_mean = mean + delta * batch_count / total
    new_m2 = m2 + jnp.var(x, axis=0) * batch_count + delta**2 * count * batch_count / total
    new_m2 = jnp.where(count == 0, jnp.zeros_like(new_m2), new_m2)
    return (total, new_mean, new_m2)


def welford_compute(state):
    count, mean, m2 = state
    var = jnp.where(count < 2, jnp.nan, m2 / jnp.maximum(count - 1, 1))
    return mean, var


def f_score(beta: float) -> Callable:
    """https://en.wikipedia.org/wiki/F-score#Definition (reference ``utils:141-143``)."""
    return lambda p, r: (1 + beta**2) * p * r / (beta**2 * p + r)


def random_pad(
    image: np.ndarray,
    target_size: Union[int, Tuple[int, int]],
    fill: Union[float, int] = 0,
) -> np.ndarray:
    """Host-side random pad (and downscale if needed) of an HWC numpy image.

    Data-pipeline helper (reference ``utils:61-88``); runs on CPU in the
    input pipeline, never on device.
    """
    if isinstance(target_size, int):
        target_size = (target_size, target_size)
    h, w = image.shape[:2]
    if h > target_size[0] or w > target_size[1]:
        scale = min(target_size[0] / h, target_size[1] / w)
        new_h, new_w = int(h * scale), int(w * scale)
        ys = (np.arange(new_h) * (h / new_h)).astype(np.int64)
        xs = (np.arange(new_w) * (w / new_w)).astype(np.int64)
        image = image[ys][:, xs]
        h, w = new_h, new_w
    pad_h, pad_w = target_size[0] - h, target_size[1] - w
    top = random.randint(0, pad_h)
    left = random.randint(0, pad_w)
    pad_spec = [(top, pad_h - top), (left, pad_w - left)] + [(0, 0)] * (image.ndim - 2)
    return np.pad(image, pad_spec, constant_values=fill)


def recursive_getattr(obj: Any, attr: str, *args):
    def _getattr(obj: Any, attr: str):
        return getattr(obj, attr, *args)

    return functools.reduce(_getattr, [obj] + attr.split("."))


def recursive_setattr(obj: Any, attr: str, val: Any):
    pre, _, post = attr.rpartition(".")
    return setattr(recursive_getattr(obj, pre) if pre else obj, post, val)

"""Input preprocessing (reference ``src/sihl/layers/preprocessing.py``)."""

from typing import List

import jax.numpy as jnp
from flax import nnx


class Normalize(nnx.Module):
    """Per-channel (x - mean) / std on NHWC input."""

    def __init__(self, mean: List[float], std: List[float]):
        self.mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
        self.std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ((x - self.mean.astype(x.dtype)) / self.std.astype(x.dtype)).astype(x.dtype)


class PadToMultipleOf(nnx.Module):
    def __init__(self, n: int):
        self.n = n

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad_y = (self.n - x.shape[1] % self.n) % self.n
        pad_x = (self.n - x.shape[2] % self.n) % self.n
        return jnp.pad(
            x,
            [
                (0, 0),
                (pad_y // 2, pad_y - pad_y // 2),
                (pad_x // 2, pad_x - pad_x // 2),
                (0, 0),
            ],
        )

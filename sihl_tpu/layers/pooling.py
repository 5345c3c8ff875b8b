"""Antialiased blur-pool module (reference ``src/sihl/layers/pooling.py``)."""

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.ops.image import blur_pool_2d


class BlurPool2d(nnx.Module):
    """Binomial-kernel antialiased downsampling (https://arxiv.org/abs/1904.11486)."""

    def __init__(self, in_channels: int, kernel_size: int = 3, stride: int = 1, **_):
        self.in_channels = in_channels
        self.kernel_size = kernel_size
        self.stride = stride

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return blur_pool_2d(x, self.kernel_size, self.stride)

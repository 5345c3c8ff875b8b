"""Up/down-scaling blocks (reference ``src/sihl/layers/scalers.py``)."""

from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import ConvNormAct, make_conv, _rngs
from sihl_tpu.layers.pooling import BlurPool2d
from sihl_tpu.ops.image import avg_pool2d, interpolate as _interpolate
from sihl_tpu.policy import compute_dtype, param_dtype


class StridedDownscaler(ConvNormAct):
    def __init__(self, in_channels: int, out_channels: int, *, rngs=None, **kwargs):
        super().__init__(in_channels, out_channels, stride=2, rngs=rngs, **kwargs)


class AntialiasedDownscaler(nnx.Module):
    """ConvNormAct followed by strided BlurPool (reference ``scalers.py:16-23``)."""

    def __init__(
        self, in_channels: int, out_channels: int, kernel_size: int = 3, *, rngs=None, **kwargs
    ):
        self.conv = ConvNormAct(in_channels, out_channels, kernel_size, rngs=rngs, **kwargs)
        self.pool = BlurPool2d(out_channels, stride=2)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.pool(self.conv(x))


class SimpleDownscaler(nnx.Module):
    def __init__(
        self, in_channels: int, out_channels: int, kernel_size: int = 3, *, rngs=None, **kwargs
    ):
        self.conv = ConvNormAct(in_channels, out_channels, kernel_size, rngs=rngs, **kwargs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return avg_pool2d(self.conv(x), 2, stride=2)


class Interpolate(nnx.Module):
    def __init__(
        self,
        scale: Optional[Union[float, int]] = None,
        size: Optional[Union[int, Tuple[int, int]]] = None,
        mode: str = "bilinear",
    ):
        self.scale, self.size, self.mode = scale, size, mode

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size = (self.size, self.size) if isinstance(self.size, int) else self.size
        return _interpolate(x, size=size, scale=self.scale, mode=self.mode)


class SimpleUpscaler(nnx.Module):
    """2x upscale then conv (reference ``scalers.py:50-56``)."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int = 3, *, rngs=None):
        self.conv = ConvNormAct(in_channels, out_channels, kernel_size, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(_interpolate(x, scale=2, mode="bilinear"))


class BilinearAdditiveUpscaler(nnx.Module):
    """https://arxiv.org/abs/1707.05847 (reference ``scalers.py:59-75``)."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int = 3, *, rngs=None):
        rngs = _rngs(rngs)
        assert in_channels % 4 == 0
        self.in_channels = in_channels
        self.residual = nnx.ConvTranspose(
            in_channels,
            in_channels // 4,
            kernel_size=(2, 2),
            strides=(2, 2),
            dtype=compute_dtype(),
            param_dtype=param_dtype(),
            rngs=rngs,
        )
        self.out_conv = ConvNormAct(
            in_channels // 4, out_channels, kernel_size=kernel_size, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        up = _interpolate(x, scale=2, mode="bilinear")
        # channel-group mean: (b, h, w, 4, c//4) -> mean over the group axis
        a = jnp.mean(up.reshape(b, 2 * h, 2 * w, 4, c // 4), axis=3)
        return self.out_conv(a + self.residual(x))

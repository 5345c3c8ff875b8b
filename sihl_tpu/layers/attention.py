"""CBAM-style attention blocks (reference ``src/sihl/layers/attention.py``).

Public-API parity; unused by heads in the reference as well.
"""

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, _rngs


class SpatialAttention(nnx.Module):
    """https://arxiv.org/abs/1807.06521"""

    def __init__(self, kernel_size: int = 7, *, rngs=None):
        self.conv = make_conv(2, 1, kernel_size, padding=kernel_size // 2, rngs=_rngs(rngs))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        return nnx.sigmoid(self.conv(jnp.concatenate([avg_out, max_out], axis=-1)))


class ChannelAttention(nnx.Module):
    """https://arxiv.org/abs/1807.06521"""

    def __init__(self, in_channels: int, ratio: int = 16, *, rngs=None):
        rngs = _rngs(rngs)
        hidden = max(in_channels // ratio, 1)
        self.conv1 = make_conv(in_channels, hidden, 1, rngs=rngs)
        self.conv2 = make_conv(hidden, in_channels, 1, rngs=rngs)

    def _mlp(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv2(nnx.relu(self.conv1(x)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg_out = self._mlp(jnp.mean(x, axis=(1, 2), keepdims=True))
        max_out = self._mlp(jnp.max(x, axis=(1, 2), keepdims=True))
        return nnx.sigmoid(avg_out + max_out)


class CBAM(nnx.Module):
    """https://arxiv.org/abs/1807.06521

    Note: the reference passes ``kernel_size`` as ChannelAttention's ratio
    (``attention.py:49``); preserved for parity.
    """

    def __init__(
        self,
        in_channels: int,
        kernel_size: int = 7,
        ratio: int = 16,
        applied: bool = False,
        *,
        rngs=None,
    ):
        rngs = _rngs(rngs)
        self.applied = applied
        self.channel_attention = ChannelAttention(in_channels, kernel_size, rngs=rngs)
        self.spatial_attention = SpatialAttention(kernel_size, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.channel_attention(x) * x
        attention = self.spatial_attention(x) * x
        return attention * x if self.applied else attention


class CrossCBAM(nnx.Module):
    """https://arxiv.org/abs/2306.02306"""

    def __init__(self, in_channels: int, kernel_size: int = 7, ratio: int = 16, *, rngs=None):
        rngs = _rngs(rngs)
        self.channel_attention_high = ChannelAttention(in_channels, ratio, rngs=rngs)
        self.spatial_attention_high = SpatialAttention(kernel_size, rngs=rngs)
        self.channel_attention_low = ChannelAttention(in_channels, ratio, rngs=rngs)
        self.spatial_attention_low = SpatialAttention(kernel_size, rngs=rngs)

    def __call__(self, low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
        mid_low = self.channel_attention_low(low) * high
        mid_high = self.channel_attention_high(high) * low
        out_low = self.spatial_attention_low(mid_low) * mid_high
        out_high = self.spatial_attention_high(mid_high) * mid_low
        return out_low + out_high

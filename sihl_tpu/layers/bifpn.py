"""BiFPN neck (reference ``src/sihl/layers/bifpn.py``).

``FastNormalizedFusion`` keeps the reference's softmax weighting (not the
paper's ReLU/(sum+eps), ``bifpn.py:15-17``).
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import ConvNormAct, _rngs
from sihl_tpu.layers.scalers import AntialiasedDownscaler
from sihl_tpu.ops.image import upsample2x_nearest
from sihl_tpu.ops.pallas.fusion import fused_weighted_sum
from sihl_tpu.policy import param_dtype


class FastNormalizedFusion(nnx.Module):
    def __init__(self, num_inputs: int = 2):
        self.weights = nnx.Param(jnp.ones((num_inputs,), param_dtype()))

    def __call__(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        weights = nnx.softmax(self.weights[...].astype(jnp.float32), axis=0)
        return fused_weighted_sum(weights, inputs)


class BiFPNLayer(nnx.Module):
    def __init__(self, out_channels: int, num_levels: int, *, rngs=None, **kwargs):
        rngs = _rngs(rngs)
        assert num_levels > 1, num_levels
        self.num_levels = num_levels
        n = num_levels - 1
        self.up_fusions = nnx.List(FastNormalizedFusion(2) for _ in range(n))
        self.up_convs = nnx.List(
            ConvNormAct(out_channels, out_channels, rngs=rngs, **kwargs) for _ in range(n)
        )
        self.downscalers = nnx.List(
            AntialiasedDownscaler(out_channels, out_channels, rngs=rngs, **kwargs)
            for _ in range(n)
        )
        self.down_fusions = nnx.List(FastNormalizedFusion(3) for _ in range(n))
        self.down_convs = nnx.List(
            ConvNormAct(out_channels, out_channels, rngs=rngs, **kwargs) for _ in range(n)
        )

    def __call__(self, inputs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        assert len(inputs) == self.num_levels
        top_down = [inputs[-1]]
        for idx, (conv, fuse) in enumerate(zip(self.up_convs, self.up_fusions)):
            top_down.append(
                conv(fuse([upsample2x_nearest(top_down[-1]), inputs[-2 - idx]]))
            )
        top_down = top_down[::-1]  # lowest level first
        bottom_up = [top_down[0]]
        for idx, (conv, fuse, downscale) in enumerate(
            zip(self.down_convs, self.down_fusions, self.downscalers)
        ):
            args = [downscale(bottom_up[-1]), inputs[idx + 1], top_down[idx + 1]]
            bottom_up.append(conv(fuse(args)))
        return bottom_up


class BiFPN(nnx.Module):
    """https://arxiv.org/abs/1911.09070"""

    def __init__(
        self,
        in_channels: List[int],
        out_channels: int,
        bottom_level: int,
        top_level: int,
        num_layers: int = 3,
        *,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        rngs = _rngs(rngs)
        assert num_layers > 0
        assert 0 < bottom_level < top_level
        self.out_channels = list(in_channels[:bottom_level]) + [
            out_channels for _ in range(bottom_level, top_level + 1)
        ]
        self.bottom_level = bottom_level
        self.top_level = top_level
        self.lateral_connections = nnx.List(
            ConvNormAct(in_c, out_channels, kernel_size=1, rngs=rngs, **kwargs)
            for in_c in in_channels[bottom_level : top_level + 1]
        )
        self.downscalers = nnx.List(
            AntialiasedDownscaler(out_channels, out_channels, rngs=rngs, **kwargs)
            for _ in range(top_level + 1 - len(in_channels))
        )
        num_levels = top_level - bottom_level + 1
        self.layers = nnx.List(
            BiFPNLayer(out_channels, num_levels, rngs=rngs, **kwargs)
            for _ in range(num_layers)
        )

    def __call__(self, inputs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        features = [
            lateral(inputs[self.bottom_level + idx])
            for idx, lateral in enumerate(self.lateral_connections)
        ]
        for downscaler in self.downscalers:
            features.append(downscaler(features[-1]))
        for layer in self.layers:
            features = layer(features)
        return inputs[: self.bottom_level] + features + inputs[self.top_level + 1 :]

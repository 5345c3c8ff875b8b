"""Path Aggregation Network neck (reference ``src/sihl/layers/pan.py``)."""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import ConvNormAct, _rngs
from sihl_tpu.layers.fpn import FPN


class PAN(FPN):
    """https://arxiv.org/abs/1803.01534 — FPN plus a bottom-up path."""

    def __init__(
        self,
        in_channels: List[int],
        out_channels: int,
        bottom_level: int,
        top_level: int,
        norm: str = "batch",
        act: str = "silu",
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = _rngs(rngs)
        super().__init__(
            in_channels, out_channels, bottom_level, top_level, norm, act, rngs=rngs
        )
        self.downscalers = nnx.List(
            ConvNormAct(out_channels, out_channels, stride=2, norm=norm, act=act, rngs=rngs)
            for _ in range(bottom_level, top_level)
        )

    def __call__(self, inputs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        inputs = super().__call__(inputs)
        xs = inputs[self.bottom_level : self.top_level + 1]
        outputs = [xs[0]]
        for i, downscale in enumerate(self.downscalers):
            outputs.append(downscale(outputs[-1]) + xs[i + 1])
        return inputs[: self.bottom_level] + outputs + inputs[self.top_level + 1 :]

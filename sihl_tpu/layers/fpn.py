"""Feature Pyramid Network neck (reference ``src/sihl/layers/fpn.py``).

Pyramid contract: replaces levels [bottom_level, top_level] with fused
``out_channels`` maps; passes other levels through untouched.  Fusion is
1x1 laterals + nearest 2x upsample + add, with extra stride-2 convs
synthesizing levels beyond the backbone's top.
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import StandardConvNormAct, _rngs
from sihl_tpu.ops.pallas.fusion import fused_upsample_add


class FPN(nnx.Module):
    """https://arxiv.org/abs/1612.03144"""

    def __init__(
        self,
        in_channels: List[int],
        out_channels: int,
        bottom_level: int,
        top_level: int,
        norm: str = "batch",
        act: str = "relu",
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = _rngs(rngs)
        assert 0 < bottom_level < top_level
        self.in_levels = range(bottom_level, min(top_level + 1, len(in_channels)))
        self.bottom_level, self.top_level = bottom_level, top_level
        levels = range(bottom_level, top_level + 1)
        self.out_channels = list(in_channels)
        self.out_channels[levels.start : levels.stop] = [out_channels for _ in levels]

        conv = lambda cin, cout, k=3, stride=1: StandardConvNormAct(
            cin, cout, k, stride=stride, norm=norm, act=act, rngs=rngs
        )
        self.input_projections = nnx.List(
            conv(in_channels[level], out_channels, 1) for level in self.in_levels
        )
        self.up_convs = nnx.List(conv(out_channels, out_channels, 1) for _ in self.in_levels[:-1])
        self.extra_downscalers = nnx.List(
            conv(out_channels, out_channels, 3, stride=2)
            for _ in range(top_level - len(in_channels) + 1)
        )
        self.out_convs = nnx.List(conv(out_channels, out_channels) for _ in levels)

    def __call__(self, inputs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        xs = inputs[self.in_levels.start : self.in_levels.stop]
        xs = [project(x) for project, x in zip(self.input_projections, xs)]

        # top-down pathway: refine-then-upsample-add, highest level first
        top_down = [xs[-1]]
        for i, conv in enumerate(self.up_convs):
            top_down[i] = conv(top_down[i])
            top_down.append(fused_upsample_add(top_down[i], xs[-(i + 2)]))

        top_down = top_down[::-1]
        for down in self.extra_downscalers:
            top_down.append(down(top_down[-1]))

        top_down = [conv(feat) for conv, feat in zip(self.out_convs, top_down)]
        return inputs[: self.bottom_level] + top_down + inputs[self.top_level + 1 :]

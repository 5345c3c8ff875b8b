"""Path Aggregation Network neck.

Behavioral contract (reference ``src/sihl/layers/pan.py:9-33``): an FPN
pass followed by a bottom-up aggregation path — each level above the
bottom adds a stride-2 downscale of the (already aggregated) level below.

Note: the reference constructs its FPN base *without* forwarding
norm/act (its FPN accepts neither), a latent bug this rebuild fixes —
here the whole stack honors the requested norm/act pair (default silu,
matching the reference PAN's conv blocks).
"""

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
        # one stride-2 aggregator per level above the bottom (sihl's own
        # conv order: conv -> act -> norm)
        self.aggregate = nnx.List(
            ConvNormAct(
                out_channels, out_channels, stride=2, norm=norm, act=act, rngs=rngs
            )
            for _ in range(bottom_level, top_level)
        )

    def __call__(self, features: List[jnp.ndarray]) -> List[jnp.ndarray]:
        pyramid = super().__call__(features)
        bot = self.bottom_level
        out = {bot: pyramid[bot]}
        for step, down in enumerate(self.aggregate):
            lvl = bot + step + 1
            out[lvl] = down(out[lvl - 1]) + pyramid[lvl]
        fused = [out[lvl] for lvl in range(bot, self.top_level + 1)]
        return list(pyramid[:bot]) + fused + list(pyramid[self.top_level + 1 :])

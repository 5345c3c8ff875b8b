"""Feature Pyramid Network neck.

Behavioral contract (reference ``src/sihl/layers/fpn.py:11-55``): replaces
pyramid levels [bottom_level, top_level] with ``out_channels``-wide fused
maps and passes every other level through untouched.  Per level: a 1x1
projection; top-down merging by nearest 2x upsample + add, where each
upper map is refined by a 1x1 conv *before* it is upsampled (and that
refined map is what the level ultimately emits); levels beyond the
backbone's top are synthesized with stride-2 convs from the highest
merged map; every emitted level passes through a final 3x3 smoothing
conv.

TPU notes: NHWC throughout.  The upsample+add pair goes through
``ops/pallas/fusion.fused_upsample_add``, which by DEFAULT lowers to the
plain XLA ``repeat + add`` — XLA fuses that into the adjacent conv and the
hand-written Pallas VMEM kernel measured ~10% SLOWER on the flagship bench
(round-1 A/B), so the kernel ships opt-in behind the global Pallas gate
``SIHL_TPU_PALLAS=1`` for memory-bound configurations only.
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
        self.bottom_level = bottom_level
        self.top_level = top_level
        # highest level the backbone actually provides; anything above is
        # synthesized by stride-2 convs
        self.highest_in = min(top_level, len(in_channels) - 1)
        self.out_channels = (
            list(in_channels[:bottom_level])
            + [out_channels] * (top_level - bottom_level + 1)
            + list(in_channels[top_level + 1 :])
        )

        def conv(cin, cout, k=3, stride=1):
            return StandardConvNormAct(
                cin, cout, k, stride=stride, norm=norm, act=act, rngs=rngs
            )

        num_in = self.highest_in - bottom_level + 1
        # 1x1 projections, one per backbone level (bottom..highest_in)
        self.project = nnx.List(
            conv(in_channels[bottom_level + i], out_channels, 1)
            for i in range(num_in)
        )
        # pre-upsample refinement convs, one per level ABOVE the bottom
        self.refine = nnx.List(conv(out_channels, out_channels, 1) for _ in range(num_in - 1))
        # stride-2 synthesizers for levels above the backbone top
        self.synthesize = nnx.List(
            conv(out_channels, out_channels, 3, stride=2)
            for _ in range(top_level - self.highest_in)
        )
        # final 3x3 smoothing, one per emitted level (bottom..top)
        self.smooth = nnx.List(
            conv(out_channels, out_channels)
            for _ in range(top_level - bottom_level + 1)
        )

    def _index(self, level: int) -> int:
        return level - self.bottom_level

    def __call__(self, features: List[jnp.ndarray]) -> List[jnp.ndarray]:
        bot, top_in = self.bottom_level, self.highest_in
        merged = {
            lvl: self.project[self._index(lvl)](features[lvl])
            for lvl in range(bot, top_in + 1)
        }

        # top-down: refine the upper map, emit it, and fold it into the
        # level below with one fused upsample+add pass
        for lvl in range(top_in, bot, -1):
            refined = self.refine[self._index(lvl) - 1](merged[lvl])
            merged[lvl] = refined
            merged[lvl - 1] = fused_upsample_add(refined, merged[lvl - 1])

        for lvl in range(top_in + 1, self.top_level + 1):
            merged[lvl] = self.synthesize[lvl - top_in - 1](merged[lvl - 1])

        fused = [
            self.smooth[self._index(lvl)](merged[lvl])
            for lvl in range(bot, self.top_level + 1)
        ]
        return list(features[:bot]) + fused + list(features[self.top_level + 1 :])

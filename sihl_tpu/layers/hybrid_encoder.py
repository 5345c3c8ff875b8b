"""RT-DETR-style HybridEncoder neck (reference
``src/sihl/layers/hybrid_encoder.py``): a 1-layer transformer encoder with a
2D sine position embedding on the top level, then FPN+PAN conv fusion paths
built from ``CSPRepLayer``/``RepVGGBlock``.
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import StandardConvNormAct, make_norm, _rngs
from sihl_tpu.layers.transformer import TransformerEncoderLayer
from sihl_tpu.ops.embeddings import sine_embedding_2d_grid
from sihl_tpu.ops.image import upsample2x_nearest


class RepVGGBlock(nnx.Module):
    """3x3 + 1x1 + identity-BN branches, summed then SiLU (reference :110-119)."""

    def __init__(self, num_channels: int, *, rngs=None):
        rngs = _rngs(rngs)
        self.conv1 = StandardConvNormAct(num_channels, num_channels, 3, act=None, rngs=rngs)
        self.conv2 = StandardConvNormAct(num_channels, num_channels, 1, act=None, rngs=rngs)
        self.identity = make_norm("batch", num_channels, 1, rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nnx.silu(self.conv1(x) + self.conv2(x) + self.identity(x))


class CSPRepLayer(nnx.Module):
    """Cross-stage partial fusion of two feature maps (reference :122-134)."""

    def __init__(self, in_channels: int, out_channels: int, num_layers: int = 3, *, rngs=None):
        rngs = _rngs(rngs)
        self.conv1 = StandardConvNormAct(in_channels, out_channels, 1, act="silu", rngs=rngs)
        self.conv2 = StandardConvNormAct(in_channels, out_channels, 1, act="silu", rngs=rngs)
        self.bottlenecks = nnx.List(RepVGGBlock(out_channels, rngs=rngs) for _ in range(num_layers))

    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate([x1, x2], axis=-1)
        h = self.conv1(x)
        for block in self.bottlenecks:
            h = block(h)
        return h + self.conv2(x)


class HybridEncoder(nnx.Module):
    """https://github.com/lyuwenyu/RT-DETR (rtdetr hybrid_encoder)."""

    def __init__(
        self,
        in_channels: List[int],
        out_channels: int,
        bottom_level: int,
        top_level: int,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = _rngs(rngs)
        assert out_channels % 2 == 0
        self.in_channels = in_channels
        self.top_in_level = min(top_level, len(in_channels) - 1)
        self.bottom_level, self.top_level = bottom_level, top_level
        levels = range(bottom_level, top_level + 1)
        self.num_channels = out_channels
        self.out_channels = list(in_channels)
        self.out_channels[levels.start : levels.stop] = [out_channels for _ in levels]

        self.input_projections = nnx.List(
            StandardConvNormAct(in_channels[level], out_channels, 1, act=None, rngs=rngs)
            for level in range(bottom_level, self.top_in_level + 1)
        )
        self.encoder = TransformerEncoderLayer(
            out_channels, num_heads=8, ff_dim=4 * out_channels,
            activation="gelu", norm_first=True, rngs=rngs,
        )

        conv = lambda cin, cout, k=3, stride=1: StandardConvNormAct(
            cin, cout, k, stride=stride, act="silu", rngs=rngs
        )
        # top-down (fpn)
        self.up_convs = nnx.List([])
        self.up_fusions = nnx.List([])
        for _ in range(self.top_in_level, bottom_level, -1):
            self.up_convs.append(conv(out_channels, out_channels, 1))
            self.up_fusions.append(CSPRepLayer(out_channels * 2, out_channels, rngs=rngs))

        self.extra_downscalers = nnx.List(
            conv(out_channels, out_channels, 3, stride=2)
            for _ in range(top_level - len(in_channels) + 1)
        )

        # bottom-up (pan)
        self.down_convs = nnx.List([])
        self.down_fusions = nnx.List([])
        for _ in range(bottom_level, top_level):
            self.down_convs.append(conv(out_channels, out_channels, 3, stride=2))
            self.down_fusions.append(CSPRepLayer(out_channels * 2, out_channels, rngs=rngs))

    def __call__(self, inputs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        xs = inputs[self.bottom_level : self.top_in_level + 1]
        xs = [project(x) for project, x in zip(self.input_projections, xs)]

        batch_size, height, width, _ = xs[-1].shape
        pos_emb = sine_embedding_2d_grid(height, width, self.num_channels)
        tokens = (xs[-1] + pos_emb[None].astype(xs[-1].dtype)).reshape(
            batch_size, height * width, self.num_channels
        )
        # extra residual around the (already-residual) encoder, as in reference :84
        x = tokens + self.encoder(tokens)
        x = x.reshape(batch_size, height, width, self.num_channels)
        xs = xs[:-1] + [x]

        inner_outs = [x]
        for idx, (conv, fuse) in enumerate(zip(self.up_convs, self.up_fusions)):
            feat_low = xs[len(xs) - 2 - idx]
            feat_high = conv(inner_outs[0])
            inner_outs[0] = feat_high
            inner_out = fuse(upsample2x_nearest(feat_high), feat_low)
            inner_outs.insert(0, inner_out)

        for downscaler in self.extra_downscalers:
            inner_outs.append(downscaler(inner_outs[-1]))

        outs = [inner_outs[0]]
        for idx, (conv, fuse) in enumerate(zip(self.down_convs, self.down_fusions)):
            outs.append(fuse(conv(outs[-1]), inner_outs[idx + 1]))

        return inputs[: self.bottom_level] + outs + inputs[self.top_level + 1 :]

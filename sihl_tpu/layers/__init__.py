"""Layer zoo (public-API parity with reference ``src/sihl/layers/__init__.py``)."""

from sihl_tpu.layers.attention import SpatialAttention, ChannelAttention, CBAM, CrossCBAM
from sihl_tpu.layers.bifpn import BiFPN, FastNormalizedFusion
from sihl_tpu.layers.convblocks import (
    SeparableConv2d,
    ConvNormAct,
    StandardConvNormAct,
    SequentialConvBlocks,
    Identity,
)
from sihl_tpu.layers.fpn import FPN
from sihl_tpu.layers.pan import PAN
from sihl_tpu.layers.hybrid_encoder import HybridEncoder, CSPRepLayer, RepVGGBlock
from sihl_tpu.layers.mlp import MLP
from sihl_tpu.layers.pooling import BlurPool2d
from sihl_tpu.layers.preprocessing import Normalize, PadToMultipleOf
from sihl_tpu.layers.scalers import (
    AntialiasedDownscaler,
    BilinearAdditiveUpscaler,
    Interpolate,
    SimpleDownscaler,
    SimpleUpscaler,
    StridedDownscaler,
)
from sihl_tpu.layers.transformer import TransformerEncoderLayer, TransformerDecoderLayer

__all__ = [
    "SpatialAttention",
    "ChannelAttention",
    "CBAM",
    "CrossCBAM",
    "BiFPN",
    "FastNormalizedFusion",
    "SeparableConv2d",
    "ConvNormAct",
    "StandardConvNormAct",
    "SequentialConvBlocks",
    "Identity",
    "FPN",
    "PAN",
    "HybridEncoder",
    "CSPRepLayer",
    "RepVGGBlock",
    "MLP",
    "BlurPool2d",
    "Normalize",
    "PadToMultipleOf",
    "AntialiasedDownscaler",
    "BilinearAdditiveUpscaler",
    "Interpolate",
    "SimpleDownscaler",
    "SimpleUpscaler",
    "StridedDownscaler",
    "TransformerEncoderLayer",
    "TransformerDecoderLayer",
]

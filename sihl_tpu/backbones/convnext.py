"""ConvNeXt feature nets (NHWC, flax-NNX).

Level semantics follow the reference registry
(``src/sihl/torchvision_backbone.py:14-17``): torchvision nodes
``features.{0,1,3,5,7}`` — level1 is the stride-4 stem output (the
pyramid wrapper upsamples it to stride 2 per the contract), level2 =
stage1 (stride 4), levels 3-5 = stages 2-4 (strides 8/16/32).
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, _rngs
from sihl_tpu.policy import compute_dtype, param_dtype


def _layer_norm(dim, rngs):
    return nnx.LayerNorm(
        dim, epsilon=1e-6, dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs
    )


class ConvNeXtBlock(nnx.Module):
    def __init__(self, dim, rngs=None):
        self.depthwise = make_conv(dim, dim, 7, padding=3, groups=dim, rngs=rngs)
        self.norm = _layer_norm(dim, rngs)
        self.pw1 = nnx.Linear(dim, 4 * dim, dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs)
        self.pw2 = nnx.Linear(4 * dim, dim, dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs)
        self.gamma = nnx.Param(jnp.full((dim,), 1e-6, param_dtype()))

    def __call__(self, x):
        h = self.depthwise(x)
        h = self.pw2(nnx.gelu(self.pw1(self.norm(h))))
        return x + self.gamma[...].astype(h.dtype) * h


class GRN(nnx.Module):
    """Global response normalization (ConvNeXt-V2, arXiv:2301.00808)."""

    def __init__(self, dim):
        self.gamma = nnx.Param(jnp.zeros((dim,), param_dtype()))
        self.beta = nnx.Param(jnp.zeros((dim,), param_dtype()))

    def __call__(self, x):
        gx = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=(1, 2), keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        nx = nx.astype(x.dtype)
        return (
            self.gamma[...].astype(x.dtype) * (x * nx)
            + self.beta[...].astype(x.dtype)
            + x
        )


class ConvNeXtV2Block(nnx.Module):
    def __init__(self, dim, rngs=None):
        self.depthwise = make_conv(dim, dim, 7, padding=3, groups=dim, rngs=rngs)
        self.norm = _layer_norm(dim, rngs)
        self.pw1 = nnx.Linear(dim, 4 * dim, dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs)
        self.grn = GRN(4 * dim)
        self.pw2 = nnx.Linear(4 * dim, dim, dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs)

    def __call__(self, x):
        h = self.depthwise(x)
        h = self.pw2(self.grn(nnx.gelu(self.pw1(self.norm(h)))))
        return x + h


class _Downsample(nnx.Module):
    def __init__(self, cin, cout, rngs=None):
        self.norm = _layer_norm(cin, rngs)
        self.conv = make_conv(cin, cout, 2, stride=2, padding=0, rngs=rngs)

    def __call__(self, x):
        return self.conv(self.norm(x))


CONVNEXT_CONFIGS = {
    # timm size ladder (atto..xxlarge) + torchvision sizes; "v2" variants
    # use GRN blocks (ConvNeXt-V2) instead of layer scale
    "convnext_atto": ([2, 2, 6, 2], [40, 80, 160, 320]),
    "convnext_femto": ([2, 2, 6, 2], [48, 96, 192, 384]),
    "convnext_pico": ([2, 2, 6, 2], [64, 128, 256, 512]),
    "convnext_nano": ([2, 2, 8, 2], [80, 160, 320, 640]),
    "convnext_tiny": ([3, 3, 9, 3], [96, 192, 384, 768]),
    "convnext_small": ([3, 3, 27, 3], [96, 192, 384, 768]),
    "convnext_base": ([3, 3, 27, 3], [128, 256, 512, 1024]),
    "convnext_large": ([3, 3, 27, 3], [192, 384, 768, 1536]),
    "convnext_xlarge": ([3, 3, 27, 3], [256, 512, 1024, 2048]),
    "convnext_xxlarge": ([3, 4, 30, 3], [384, 768, 1536, 3072]),
    "convnextv2_atto": ([2, 2, 6, 2], [40, 80, 160, 320]),
    "convnextv2_femto": ([2, 2, 6, 2], [48, 96, 192, 384]),
    "convnextv2_pico": ([2, 2, 6, 2], [64, 128, 256, 512]),
    "convnextv2_nano": ([2, 2, 8, 2], [80, 160, 320, 640]),
    "convnextv2_tiny": ([3, 3, 9, 3], [96, 192, 384, 768]),
    "convnextv2_base": ([3, 3, 27, 3], [128, 256, 512, 1024]),
    "convnextv2_large": ([3, 3, 27, 3], [192, 384, 768, 1536]),
}


class ConvNeXtFeatures(nnx.Module):
    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        depths, widths = CONVNEXT_CONFIGS[name]
        block_cls = ConvNeXtV2Block if name.startswith("convnextv2") else ConvNeXtBlock
        self.stem_conv = make_conv(input_channels, widths[0], 4, stride=4, padding=0, rngs=rngs)
        self.stem_norm = _layer_norm(widths[0], rngs)
        self.stages = nnx.List([])
        self.downsamples = nnx.List([])
        for i, (d, w) in enumerate(zip(depths, widths)):
            if i > 0:
                self.downsamples.append(_Downsample(widths[i - 1], w, rngs=rngs))
            self.stages.append(nnx.List([block_cls(w, rngs=rngs) for _ in range(d)]))
        # level1 = stem output (stride 4; wrapper resizes to stride 2)
        self.feature_channels = [widths[0]] + list(widths)
        self.level_modules = [
            ["stem_conv", "stem_norm"],
            [("stages", 0)],
            [("stages", 1), ("downsamples", 0)],
            [("stages", 2), ("downsamples", 1)],
            [("stages", 3), ("downsamples", 2)],
        ]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = self.stem_norm(self.stem_conv(x))
        outs = [x]
        for i, stage in enumerate(self.stages):
            if i > 0:
                x = self.downsamples[i - 1](x)
            for block in stage:
                x = block(x)
            outs.append(x)
        return outs


def make_convnext_features(name, input_channels=3, *, rngs=None):
    return ConvNeXtFeatures(name, input_channels=input_channels, rngs=rngs)

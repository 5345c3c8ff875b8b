"""DenseNet feature nets (NHWC, flax-NNX).

Level semantics follow the reference registry
(``src/sihl/torchvision_backbone.py:18-23``): level1 = stem relu output
(stride 2), levels 2-5 = denseblock1-4 outputs (pre-transition, strides
4/8/16/32).
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, make_norm, _rngs
from sihl_tpu.ops.image import avg_pool2d, max_pool2d


class _DenseLayer(nnx.Module):
    def __init__(self, cin, growth, rngs=None):
        self.norm1 = make_norm("batch", cin, 1, rngs)
        self.conv1 = make_conv(cin, 4 * growth, 1, bias=False, rngs=rngs)
        self.norm2 = make_norm("batch", 4 * growth, 1, rngs)
        self.conv2 = make_conv(4 * growth, growth, 3, bias=False, rngs=rngs)

    def __call__(self, x):
        h = self.conv1(nnx.relu(self.norm1(x)))
        h = self.conv2(nnx.relu(self.norm2(h)))
        return jnp.concatenate([x, h], axis=-1)


class _DenseBlock(nnx.Module):
    def __init__(self, cin, growth, num_layers, rngs=None):
        self.layers = nnx.List(
            _DenseLayer(cin + i * growth, growth, rngs=rngs) for i in range(num_layers)
        )

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


class _Transition(nnx.Module):
    def __init__(self, cin, cout, rngs=None):
        self.norm = make_norm("batch", cin, 1, rngs)
        self.conv = make_conv(cin, cout, 1, bias=False, rngs=rngs)

    def __call__(self, x):
        return avg_pool2d(self.conv(nnx.relu(self.norm(x))), 2, stride=2)


DENSENET_CONFIGS = {
    "densenet121": (32, 64, (6, 12, 24, 16)),
    "densenet161": (48, 96, (6, 12, 36, 24)),
    "densenet169": (32, 64, (6, 12, 32, 32)),
    "densenet201": (32, 64, (6, 12, 48, 32)),
}


class DenseNetFeatures(nnx.Module):
    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        growth, init_c, block_cfg = DENSENET_CONFIGS[name]
        self.conv0 = make_conv(input_channels, init_c, 7, stride=2, padding=3, bias=False, rngs=rngs)
        self.norm0 = make_norm("batch", init_c, 1, rngs)
        self.blocks = nnx.List([])
        self.transitions = nnx.List([])
        channels = [init_c]
        c = init_c
        for i, n in enumerate(block_cfg):
            self.blocks.append(_DenseBlock(c, growth, n, rngs=rngs))
            c = c + n * growth
            channels.append(c)
            if i < len(block_cfg) - 1:
                self.transitions.append(_Transition(c, c // 2, rngs=rngs))
                c = c // 2
        self.feature_channels = channels
        self.level_modules = [
            ["conv0", "norm0"],
            [("blocks", 0)],
            [("blocks", 1), ("transitions", 0)],
            [("blocks", 2), ("transitions", 1)],
            [("blocks", 3), ("transitions", 2)],
        ]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = nnx.relu(self.norm0(self.conv0(x)))
        outs = [x]
        x = max_pool2d(x, 3, stride=2, padding=1)
        for i, block in enumerate(self.blocks):
            x = block(x)
            outs.append(x)
            if i < len(self.transitions):
                x = self.transitions[i](x)
        return outs


def make_densenet_features(name, input_channels=3, *, rngs=None):
    return DenseNetFeatures(name, input_channels=input_channels, rngs=rngs)

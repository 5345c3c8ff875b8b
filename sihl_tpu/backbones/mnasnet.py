"""MNASNet feature nets (NHWC, flax-NNX).

Level nodes per the reference registry
(``src/sihl/torchvision_backbone.py:35-38``): torchvision ``layers.{7,8,
9,11,16}`` — the stride-2 16ch projection (level1), stack1 24ch (s4),
stack2 40ch (s8), stack4 96ch (s16), and the final 1280ch conv (s32).
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, make_norm, _rngs


def _scale(c, alpha):
    c = c * alpha
    new = max(8, int(c + 4) // 8 * 8)
    if new < 0.9 * c:
        new += 8
    return new


class _ConvBNReLU(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, relu=True, rngs=None):
        self.conv = make_conv(cin, cout, k, stride=stride, groups=groups, bias=False, rngs=rngs)
        self.bn = make_norm("batch", cout, 1, rngs)
        self.relu = relu

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return nnx.relu(x) if self.relu else x


class _InvertedResidual(nnx.Module):
    def __init__(self, cin, cout, kernel, stride, expand, rngs=None):
        mid = cin * expand
        self.use_residual = stride == 1 and cin == cout
        self.expand = _ConvBNReLU(cin, mid, 1, rngs=rngs)
        self.depthwise = _ConvBNReLU(mid, mid, kernel, stride=stride, groups=mid, rngs=rngs)
        self.project = _ConvBNReLU(mid, cout, 1, relu=False, rngs=rngs)

    def __call__(self, x):
        h = self.project(self.depthwise(self.expand(x)))
        return x + h if self.use_residual else h


# (kernel, stride, expand, out, repeats) per stack, at alpha=1.0
_STACKS = [
    (3, 2, 3, 24, 3),
    (5, 2, 3, 40, 3),
    (5, 2, 6, 80, 3),
    (3, 1, 6, 96, 2),
    (5, 2, 6, 192, 4),
    (3, 1, 6, 320, 1),
]
MNASNET_CONFIGS = {
    "mnasnet0_5": 0.5,
    "mnasnet0_75": 0.75,
    "mnasnet1_0": 1.0,
    "mnasnet1_3": 1.3,
}


class MnasNetFeatures(nnx.Module):
    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        alpha = MNASNET_CONFIGS[name]
        c32, c16 = _scale(32, alpha), _scale(16, alpha)
        self.stem = _ConvBNReLU(input_channels, c32, 3, stride=2, rngs=rngs)
        self.sep_dw = _ConvBNReLU(c32, c32, 3, groups=c32, rngs=rngs)
        self.sep_pw = _ConvBNReLU(c32, c16, 1, relu=False, rngs=rngs)
        self.stacks = nnx.List([])
        cin = c16
        stack_out = []
        for k, s, e, c, n in _STACKS:
            cout = _scale(c, alpha)
            units = nnx.List([_InvertedResidual(cin, cout, k, s, e, rngs=rngs)])
            for _ in range(n - 1):
                units.append(_InvertedResidual(cout, cout, k, 1, e, rngs=rngs))
            self.stacks.append(units)
            stack_out.append(cout)
            cin = cout
        self.head = _ConvBNReLU(cin, 1280, 1, rngs=rngs)
        # layers.{7,8,9,11,16}: projection out (s2), stack0 (s4), stack1
        # (s8), stack3 (s16), head (s32)
        self.feature_channels = [c16, stack_out[0], stack_out[1], stack_out[3], 1280]
        self.level_modules = [
            ["stem", "sep_dw", "sep_pw"],
            [("stacks", 0)],
            [("stacks", 1)],
            [("stacks", 2), ("stacks", 3)],
            [("stacks", 4), ("stacks", 5), "head"],
        ]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = self.sep_pw(self.sep_dw(self.stem(x)))
        outs = [x]
        for i, stack in enumerate(self.stacks):
            for unit in stack:
                x = unit(x)
            if i in (0, 1, 3):
                outs.append(x)
        outs.append(self.head(x))
        return outs


def make_mnasnet_features(name, input_channels=3, *, rngs=None):
    return MnasNetFeatures(name, input_channels=input_channels, rngs=rngs)

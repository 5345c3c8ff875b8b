"""ShuffleNetV2 feature nets (NHWC, flax-NNX).

Level nodes per the reference registry
(``src/sihl/torchvision_backbone.py:50-53``):
``conv1`` (s2), ``maxpool`` (s4), ``stage2`` (s8), ``stage3`` (s16),
``conv5`` (s32).
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, make_norm, _rngs
from sihl_tpu.ops.image import max_pool2d


def _channel_shuffle(x, groups=2):
    b, h, w, c = x.shape
    return (
        x.reshape(b, h, w, groups, c // groups)
        .transpose(0, 1, 2, 4, 3)
        .reshape(b, h, w, c)
    )


class _ConvBNReLU(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, relu=True, rngs=None):
        self.conv = make_conv(cin, cout, k, stride=stride, groups=groups, bias=False, rngs=rngs)
        self.bn = make_norm("batch", cout, 1, rngs)
        self.relu = relu

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return nnx.relu(x) if self.relu else x


class _ShuffleUnit(nnx.Module):
    def __init__(self, cin, cout, stride, rngs=None):
        self.stride = stride
        branch_c = cout // 2
        if stride == 2:
            self.branch1_dw = _ConvBNReLU(cin, cin, 3, stride=2, groups=cin, relu=False, rngs=rngs)
            self.branch1_pw = _ConvBNReLU(cin, branch_c, 1, rngs=rngs)
            b2_in = cin
        else:
            self.branch1_dw = None
            b2_in = cin // 2
        self.branch2_pw1 = _ConvBNReLU(b2_in, branch_c, 1, rngs=rngs)
        self.branch2_dw = _ConvBNReLU(branch_c, branch_c, 3, stride=stride, groups=branch_c, relu=False, rngs=rngs)
        self.branch2_pw2 = _ConvBNReLU(branch_c, branch_c, 1, rngs=rngs)

    def __call__(self, x):
        if self.stride == 2:
            b1 = self.branch1_pw(self.branch1_dw(x))
            b2 = self.branch2_pw2(self.branch2_dw(self.branch2_pw1(x)))
        else:
            half = x.shape[-1] // 2
            b1, rest = x[..., :half], x[..., half:]
            b2 = self.branch2_pw2(self.branch2_dw(self.branch2_pw1(rest)))
        return _channel_shuffle(jnp.concatenate([b1, b2], axis=-1))


SHUFFLENET_CONFIGS = {
    "shufflenet_v2_x0_5": ((48, 96, 192), 1024),
    "shufflenet_v2_x1_0": ((116, 232, 464), 1024),
    "shufflenet_v2_x1_5": ((176, 352, 704), 1024),
    "shufflenet_v2_x2_0": ((244, 488, 976), 2048),
}
_REPEATS = (4, 8, 4)


class ShuffleNetFeatures(nnx.Module):
    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        stage_channels, conv5_c = SHUFFLENET_CONFIGS[name]
        self.conv1 = _ConvBNReLU(input_channels, 24, 3, stride=2, rngs=rngs)
        self.stages = nnx.List([])
        cin = 24
        for cout, n in zip(stage_channels, _REPEATS):
            units = nnx.List([_ShuffleUnit(cin, cout, 2, rngs=rngs)])
            for _ in range(n - 1):
                units.append(_ShuffleUnit(cout, cout, 1, rngs=rngs))
            self.stages.append(units)
            cin = cout
        self.conv5 = _ConvBNReLU(cin, conv5_c, 1, rngs=rngs)
        self.feature_channels = [24, 24, stage_channels[0], stage_channels[1], conv5_c]
        self.level_modules = [
            ["conv1"], [], [("stages", 0)], [("stages", 1)],
            [("stages", 2), "conv5"],
        ]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        c1 = self.conv1(x)
        p = max_pool2d(c1, 3, stride=2, padding=1)
        outs = [c1, p]
        x = p
        for i, stage in enumerate(self.stages):
            for unit in stage:
                x = unit(x)
            if i < 2:
                outs.append(x)
        outs.append(self.conv5(x))
        return outs


def make_shufflenet_features(name, input_channels=3, *, rngs=None):
    return ShuffleNetFeatures(name, input_channels=input_channels, rngs=rngs)

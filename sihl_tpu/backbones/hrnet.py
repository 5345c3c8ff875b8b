"""HRNet feature nets (NHWC, flax-NNX).

High-Resolution Network per Wang et al., arXiv:1908.07919 (the timm
``hrnet_w*`` models the reference registers,
``src/sihl/timm_backbone.py:55-61``): a stride-4 stem and a stage-1
bottleneck layer, then three stages of parallel multi-resolution branches
with full cross-resolution fusion after every module (downsample = chains
of stride-2 3x3 convs; upsample = 1x1 conv + nearest resize).

Pyramid levels: level1 = the first stem conv output (64 ch, stride 2);
levels 2-5 = the four final branch outputs (C/2C/4C/8C at strides
4/8/16/32).
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, make_norm, _rngs
from sihl_tpu.ops.image import upsample2x_nearest


class _ConvBN(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, relu=True, rngs=None):
        self.conv = make_conv(cin, cout, k, stride=stride, bias=False, rngs=rngs)
        self.bn = make_norm("batch", cout, 1, rngs)
        self.relu = relu

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return nnx.relu(x) if self.relu else x


class _BasicBlock(nnx.Module):
    def __init__(self, cin, cout, stride=1, rngs=None):
        self.conv1 = _ConvBN(cin, cout, 3, stride=stride, rngs=rngs)
        self.conv2 = _ConvBN(cout, cout, 3, relu=False, rngs=rngs)
        self.down = (
            _ConvBN(cin, cout, 1, stride=stride, relu=False, rngs=rngs)
            if stride != 1 or cin != cout
            else None
        )

    def __call__(self, x):
        res = x if self.down is None else self.down(x)
        return nnx.relu(self.conv2(self.conv1(x)) + res)


class _Bottleneck(nnx.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, rngs=None):
        cout = planes * self.expansion
        self.conv1 = _ConvBN(cin, planes, 1, rngs=rngs)
        self.conv2 = _ConvBN(planes, planes, 3, stride=stride, rngs=rngs)
        self.conv3 = _ConvBN(planes, cout, 1, relu=False, rngs=rngs)
        self.down = (
            _ConvBN(cin, cout, 1, stride=stride, relu=False, rngs=rngs)
            if stride != 1 or cin != cout
            else None
        )

    def __call__(self, x):
        res = x if self.down is None else self.down(x)
        return nnx.relu(self.conv3(self.conv2(self.conv1(x))) + res)


class _FuseLink(nnx.Module):
    """Resolution adapter from branch j to branch i inside a fusion."""

    def __init__(self, c_from, c_to, steps_down: int, rngs=None):
        # steps_down > 0: chain of stride-2 convs (relu on all but last);
        # steps_down < 0: 1x1 channel conv, then nearest upsample at call
        self.steps_down = steps_down
        if steps_down > 0:
            convs = []
            c = c_from
            for s in range(steps_down):
                last = s == steps_down - 1
                convs.append(
                    _ConvBN(c, c_to if last else c, 3, stride=2, relu=not last, rngs=rngs)
                )
            self.convs = nnx.List(convs)
        else:
            self.convs = nnx.List([_ConvBN(c_from, c_to, 1, relu=False, rngs=rngs)])

    def __call__(self, x):
        if self.steps_down > 0:
            for conv in self.convs:
                x = conv(x)
            return x
        x = self.convs[0](x)
        for _ in range(-self.steps_down):
            x = upsample2x_nearest(x)
        return x


class _Module(nnx.Module):
    """One HRNet module: per-branch block stacks + full cross fusion."""

    def __init__(self, widths: List[int], blocks_per_branch: int, rngs=None):
        self.branches = nnx.List(
            nnx.List(_BasicBlock(w, w, rngs=rngs) for _ in range(blocks_per_branch))
            for w in widths
        )
        links = []
        n = len(widths)
        for i in range(n):
            row = []
            for j in range(n):
                if i == j:
                    row.append(None)
                else:
                    row.append(_FuseLink(widths[j], widths[i], j_to_i(j, i), rngs=rngs))
            links.append(nnx.List(row))
        self.links = nnx.List(links)

    def __call__(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        ys = []
        for branch, x in zip(self.branches, xs):
            for block in branch:
                x = block(x)
            ys.append(x)
        fused = []
        for i, row in enumerate(self.links):
            acc = ys[i]
            for j, link in enumerate(row):
                if link is not None:
                    acc = acc + link(ys[j])
            fused.append(nnx.relu(acc))
        return fused


def j_to_i(j: int, i: int) -> int:
    """Stride steps from branch j (stride 4*2^j) to branch i."""
    return i - j  # positive: downsample chain; negative: upsample count


HRNET_CONFIGS = {
    "hrnet_w18": 18,
    "hrnet_w30": 30,
    "hrnet_w32": 32,
    "hrnet_w40": 40,
    "hrnet_w44": 44,
    "hrnet_w48": 48,
    "hrnet_w64": 64,
}
# (modules, blocks-per-branch) per stage 2/3/4 — the standard HRNetV2 recipe
_STAGES = ((1, 4), (4, 4), (3, 4))


class HrnetFeatures(nnx.Module):
    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        c = HRNET_CONFIGS[name]
        widths = [c, 2 * c, 4 * c, 8 * c]
        self.conv1 = _ConvBN(input_channels, 64, 3, stride=2, rngs=rngs)
        self.conv2 = _ConvBN(64, 64, 3, stride=2, rngs=rngs)
        self.layer1 = nnx.List(
            [_Bottleneck(64, 64, rngs=rngs)]
            + [_Bottleneck(256, 64, rngs=rngs) for _ in range(3)]
        )
        # transitions add one lower-resolution branch at a time
        self.transition1 = nnx.List(
            [
                _ConvBN(256, widths[0], 3, rngs=rngs),
                _ConvBN(256, widths[1], 3, stride=2, rngs=rngs),
            ]
        )
        self.transition2 = _ConvBN(widths[1], widths[2], 3, stride=2, rngs=rngs)
        self.transition3 = _ConvBN(widths[2], widths[3], 3, stride=2, rngs=rngs)
        self.stage2 = nnx.List(
            _Module(widths[:2], _STAGES[0][1], rngs=rngs) for _ in range(_STAGES[0][0])
        )
        self.stage3 = nnx.List(
            _Module(widths[:3], _STAGES[1][1], rngs=rngs) for _ in range(_STAGES[1][0])
        )
        self.stage4 = nnx.List(
            _Module(widths, _STAGES[2][1], rngs=rngs) for _ in range(_STAGES[2][0])
        )
        self.feature_channels = [64] + widths
        self.level_modules = [
            ["conv1"],
            ["conv2", "layer1", "transition1"],
            ["stage2", "transition2"],
            ["stage3", "transition3"],
            ["stage4"],
        ]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        s2 = self.conv1(x)
        x = self.conv2(s2)
        for block in self.layer1:
            x = block(x)
        xs = [self.transition1[0](x), self.transition1[1](x)]
        for module in self.stage2:
            xs = module(xs)
        xs = xs + [self.transition2(xs[-1])]
        for module in self.stage3:
            xs = module(xs)
        xs = xs + [self.transition3(xs[-1])]
        for module in self.stage4:
            xs = module(xs)
        return [s2] + xs


def make_hrnet_features(name, input_channels=3, *, rngs=None):
    return HrnetFeatures(name, input_channels=input_channels, rngs=rngs)

"""MobileNetV2 / V3 feature nets (NHWC, flax-NNX).

Level semantics match the reference registry
(``src/sihl/torchvision_backbone.py:39-41``): the torchvision feature
nodes are ``features.{1,3,6,13,18}`` (v2), ``{1,3,6,12,16}`` (v3-large),
``{0,1,3,8,12}`` (v3-small).
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, make_norm, _rngs


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


_ACTS = {"RE": lambda x: jnp.clip(x, None, 6.0) * (x > 0), "HS": _hardswish,
         "relu6": lambda x: jnp.clip(jnp.maximum(x, 0.0), 0.0, 6.0)}


class _ConvBNAct(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, act="relu6", rngs=None):
        self.conv = make_conv(cin, cout, k, stride=stride, groups=groups, bias=False, rngs=rngs)
        self.bn = make_norm("batch", cout, 1, rngs)
        self.act = act

    def __call__(self, x):
        x = self.bn(self.conv(x))
        if self.act is None:
            return x
        if self.act == "RE":
            return jnp.clip(jnp.maximum(x, 0.0), 0.0, 6.0)
        if self.act == "HS":
            return _hardswish(x)
        return jnp.clip(jnp.maximum(x, 0.0), 0.0, 6.0)  # relu6


class _SEv3(nnx.Module):
    def __init__(self, channels, squeeze, rngs=None):
        self.fc1 = make_conv(channels, squeeze, 1, rngs=rngs)
        self.fc2 = make_conv(squeeze, channels, 1, rngs=rngs)

    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        return x * _hardsigmoid(self.fc2(nnx.relu(self.fc1(s))))


class InvertedResidualV2(nnx.Module):
    def __init__(self, cin, cout, stride, expand_ratio, rngs=None):
        hidden = cin * expand_ratio
        self.use_residual = stride == 1 and cin == cout
        self.expand = _ConvBNAct(cin, hidden, 1, rngs=rngs) if expand_ratio != 1 else None
        self.depthwise = _ConvBNAct(hidden, hidden, 3, stride=stride, groups=hidden, rngs=rngs)
        self.project = _ConvBNAct(hidden, cout, 1, act=None, rngs=rngs)

    def __call__(self, x):
        h = x if self.expand is None else self.expand(x)
        h = self.project(self.depthwise(h))
        return x + h if self.use_residual else h


class InvertedResidualV3(nnx.Module):
    def __init__(self, cin, cout, kernel, exp, use_se, act, stride, rngs=None):
        self.use_residual = stride == 1 and cin == cout
        self.expand = _ConvBNAct(cin, exp, 1, act=act, rngs=rngs) if exp != cin else None
        self.depthwise = _ConvBNAct(exp, exp, kernel, stride=stride, groups=exp, act=act, rngs=rngs)
        self.se = _SEv3(exp, _round8(exp // 4), rngs=rngs) if use_se else None
        self.project = _ConvBNAct(exp, cout, 1, act=None, rngs=rngs)

    def __call__(self, x):
        h = x if self.expand is None else self.expand(x)
        h = self.depthwise(h)
        if self.se is not None:
            h = self.se(h)
        h = self.project(h)
        return x + h if self.use_residual else h


def _round8(v):
    new = max(8, int(v + 4) // 8 * 8)
    if new < 0.9 * v:
        new += 8
    return new


_V2_CFG = [  # (expand, out, num, stride)
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]
# v3: (kernel, exp, out, se, act, stride)
_V3_LARGE = [
    (3, 16, 16, False, "RE", 1), (3, 64, 24, False, "RE", 2),
    (3, 72, 24, False, "RE", 1), (5, 72, 40, True, "RE", 2),
    (5, 120, 40, True, "RE", 1), (5, 120, 40, True, "RE", 1),
    (3, 240, 80, False, "HS", 2), (3, 200, 80, False, "HS", 1),
    (3, 184, 80, False, "HS", 1), (3, 184, 80, False, "HS", 1),
    (3, 480, 112, True, "HS", 1), (3, 672, 112, True, "HS", 1),
    (5, 672, 160, True, "HS", 2), (5, 960, 160, True, "HS", 1),
    (5, 960, 160, True, "HS", 1),
]
_V3_SMALL = [
    (3, 16, 16, True, "RE", 2), (3, 72, 24, False, "RE", 2),
    (3, 88, 24, False, "RE", 1), (5, 96, 40, True, "HS", 2),
    (5, 240, 40, True, "HS", 1), (5, 240, 40, True, "HS", 1),
    (5, 120, 48, True, "HS", 1), (5, 144, 48, True, "HS", 1),
    (5, 288, 96, True, "HS", 2), (5, 576, 96, True, "HS", 1),
    (5, 576, 96, True, "HS", 1),
]
MOBILENET_CONFIGS = {
    "mobilenet_v2": _V2_CFG,
    "mobilenet_v3_large": _V3_LARGE,
    "mobilenet_v3_small": _V3_SMALL,
    # timm width variants (timm_backbone.py:24-30): channels scaled by the
    # multiplier through make_divisible(., 8), torchvision/timm semantics
    "mobilenet_v2_050": _V2_CFG,
    "mobilenet_v2_140": _V2_CFG,
    "mobilenet_v3_small_050": _V3_SMALL,
    "mobilenet_v3_small_075": _V3_SMALL,
}

_WIDTH_MULT = {
    "mobilenet_v2_050": 0.5,
    "mobilenet_v2_140": 1.4,
    "mobilenet_v3_small_050": 0.5,
    "mobilenet_v3_small_075": 0.75,
}


class MobileNetFeatures(nnx.Module):
    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        self.name = name
        self.blocks = nnx.List([])
        width = _WIDTH_MULT.get(name, 1.0)
        adjust = (lambda c: _round8(c * width)) if width != 1.0 else (lambda c: c)
        if name.startswith("mobilenet_v2"):
            stem_c = adjust(32)
            self.stem = _ConvBNAct(input_channels, stem_c, 3, stride=2, rngs=rngs)
            cin = stem_c
            for t, c, n, s in _V2_CFG:
                c = adjust(c)
                for i in range(n):
                    self.blocks.append(
                        InvertedResidualV2(cin, c, s if i == 0 else 1, t, rngs=rngs)
                    )
                    cin = c
            # torchvision: last_channel = make_divisible(1280 * max(1, w))
            head_c = _round8(1280 * max(1.0, width))
            self.head = _ConvBNAct(cin, head_c, 1, rngs=rngs)
            # torchvision nodes features.{1,3,6,13,18}: blocks are features 1..17
            self._emit_blocks = [0, 2, 5, 12]  # 0-based block indices
            self._emit_head = True
            self.feature_channels = [adjust(16), adjust(24), adjust(32), adjust(96), head_c]
        else:
            cfg = MOBILENET_CONFIGS[name]
            stem_c = adjust(16)
            self.stem = _ConvBNAct(input_channels, stem_c, 3, stride=2, act="HS", rngs=rngs)
            cin = stem_c
            for k, exp, c, se, act, s in cfg:
                exp, c = adjust(exp), adjust(c)
                self.blocks.append(
                    InvertedResidualV3(cin, c, k, exp, se, act, s, rngs=rngs)
                )
                cin = c
            # torchvision: lastconv_output = 6 * lastconv_input (=> 960/576 at w=1)
            head_c = 6 * cin
            self.head = _ConvBNAct(cin, head_c, 1, act="HS", rngs=rngs)
            if "large" in name:
                # features.{1,3,6,12,16}: blocks are features 1..15
                self._emit_blocks = [0, 2, 5, 11]
                self._emit_stem = False
                self.feature_channels = [adjust(16), adjust(24), adjust(40), adjust(112), head_c]
            else:
                # features.{0,1,3,8,12}: level1 = stem output; features.8
                # is block7 (48 ch, stride 16)
                self._emit_blocks = [0, 2, 7]
                self._emit_stem = True
                self.feature_channels = [stem_c, adjust(16), adjust(24), adjust(48), head_c]
            self._emit_head = True
        if not hasattr(self, "_emit_stem"):
            self._emit_stem = False

        first = ["stem", ("blocks", 0)] if not self._emit_stem else ["stem"]
        self.level_modules = [first, [], [], [], ["head"]]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = self.stem(x)
        outs = [x] if self._emit_stem else []
        emit = set(self._emit_blocks)
        for i, block in enumerate(self.blocks):
            x = block(x)
            if i in emit:
                outs.append(x)
        outs.append(self.head(x))
        return outs


def make_mobilenet_features(name, input_channels=3, *, rngs=None):
    return MobileNetFeatures(name, input_channels=input_channels, rngs=rngs)

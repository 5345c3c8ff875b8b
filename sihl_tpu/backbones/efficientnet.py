"""EfficientNet B0-B7 and V2 feature nets (NHWC, flax-NNX).

Level semantics match the reference registry
(``src/sihl/torchvision_backbone.py:24-34``): torchvision feature nodes
``features.{1,2,3,5,8}`` — i.e. level1 = stage1 (stride 2), level2 =
stage2 (4), level3 = stage3 (8), level4 = stage5 (16), level5 = the 1x1
head conv output (stride 32).  Structure mirrors torchvision (MBConv with
squeeze-excitation; FusedMBConv for V2 early stages).  Stochastic depth is
omitted (training-dynamics nuance only; inference-equivalent).
"""

import math
from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, make_norm, _rngs


def _round_channels(channels: float, divisor: int = 8) -> int:
    new = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new < 0.9 * channels:
        new += divisor
    return new


class _ConvBNAct(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, act=True, relu6=False, rngs=None):
        self.conv = make_conv(cin, cout, k, stride=stride, groups=groups, bias=False, rngs=rngs)
        self.bn = make_norm("batch", cout, 1, rngs)
        self.act = act
        self.relu6 = relu6

    def __call__(self, x):
        x = self.bn(self.conv(x))
        if not self.act:
            return x
        if self.relu6:
            return jnp.clip(jnp.maximum(x, 0.0), 0.0, 6.0)
        return nnx.silu(x)


class SqueezeExcite(nnx.Module):
    def __init__(self, channels, squeeze_channels, rngs=None):
        self.fc1 = make_conv(channels, squeeze_channels, 1, rngs=rngs)
        self.fc2 = make_conv(squeeze_channels, channels, 1, rngs=rngs)

    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nnx.sigmoid(self.fc2(nnx.silu(self.fc1(s))))
        return x * s


class MBConv(nnx.Module):
    def __init__(self, cin, cout, kernel, stride, expand_ratio, use_se=True,
                 relu6=False, rngs=None):
        expanded = cin * expand_ratio
        self.use_residual = stride == 1 and cin == cout
        self.expand = (
            _ConvBNAct(cin, expanded, 1, relu6=relu6, rngs=rngs)
            if expand_ratio != 1
            else None
        )
        self.depthwise = _ConvBNAct(
            expanded, expanded, kernel, stride=stride, groups=expanded,
            relu6=relu6, rngs=rngs,
        )
        self.se = SqueezeExcite(expanded, max(1, cin // 4), rngs=rngs) if use_se else None
        self.project = _ConvBNAct(expanded, cout, 1, act=False, rngs=rngs)

    def __call__(self, x):
        h = x
        if self.expand is not None:
            h = self.expand(h)
        h = self.depthwise(h)
        if self.se is not None:
            h = self.se(h)
        h = self.project(h)
        return x + h if self.use_residual else h


class FusedMBConv(nnx.Module):
    def __init__(self, cin, cout, kernel, stride, expand_ratio, rngs=None):
        expanded = cin * expand_ratio
        self.use_residual = stride == 1 and cin == cout
        if expand_ratio != 1:
            self.fused = _ConvBNAct(cin, expanded, kernel, stride=stride, rngs=rngs)
            self.project = _ConvBNAct(expanded, cout, 1, act=False, rngs=rngs)
        else:
            self.fused = _ConvBNAct(cin, cout, kernel, stride=stride, rngs=rngs)
            self.project = None

    def __call__(self, x):
        h = self.fused(x)
        if self.project is not None:
            h = self.project(h)
        return x + h if self.use_residual else h


class _Stage(nnx.Module):
    def __init__(self, block, cin, cout, kernel, stride, expand, num, rngs, **kw):
        self.blocks = nnx.List([])
        for i in range(num):
            self.blocks.append(
                block(cin if i == 0 else cout, cout, kernel, stride if i == 0 else 1,
                      expand, rngs=rngs, **kw)
            )

    def __call__(self, x):
        for b in self.blocks:
            x = b(x)
        return x


# (block, expand, kernel, stride, out_channels, num_layers) for B0; B1-B7
# scale width/depth.
_B0_STAGES = [
    (MBConv, 1, 3, 1, 16, 1),
    (MBConv, 6, 3, 2, 24, 2),
    (MBConv, 6, 5, 2, 40, 2),
    (MBConv, 6, 3, 2, 80, 3),
    (MBConv, 6, 5, 1, 112, 3),
    (MBConv, 6, 5, 2, 192, 4),
    (MBConv, 6, 3, 1, 320, 1),
]
_B_MULTS = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6),
    "efficientnet_b7": (2.0, 3.1),
}
_V2_STAGES = {
    "efficientnet_v2_s": [
        (FusedMBConv, 1, 3, 1, 24, 2),
        (FusedMBConv, 4, 3, 2, 48, 4),
        (FusedMBConv, 4, 3, 2, 64, 4),
        (MBConv, 4, 3, 2, 128, 6),
        (MBConv, 6, 3, 1, 160, 9),
        (MBConv, 6, 3, 2, 256, 15),
    ],
    "efficientnet_v2_m": [
        (FusedMBConv, 1, 3, 1, 24, 3),
        (FusedMBConv, 4, 3, 2, 48, 5),
        (FusedMBConv, 4, 3, 2, 80, 5),
        (MBConv, 4, 3, 2, 160, 7),
        (MBConv, 6, 3, 1, 176, 14),
        (MBConv, 6, 3, 2, 304, 18),
        (MBConv, 6, 3, 1, 512, 5),
    ],
    "efficientnet_v2_l": [
        (FusedMBConv, 1, 3, 1, 32, 4),
        (FusedMBConv, 4, 3, 2, 64, 7),
        (FusedMBConv, 4, 3, 2, 96, 7),
        (MBConv, 4, 3, 2, 192, 10),
        (MBConv, 6, 3, 1, 224, 19),
        (MBConv, 6, 3, 2, 384, 25),
        (MBConv, 6, 3, 1, 640, 7),
    ],
}
EFFICIENTNET_CONFIGS = {**_B_MULTS, **_V2_STAGES, "efficientnet_lite0": None}


class EfficientNetFeatures(nnx.Module):
    """Pyramid feature net; returns levels 1..5 at strides 2..32."""

    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        lite = name.startswith("efficientnet_lite")
        if lite:
            # lite0 = B0 stages, no SE, relu6, fixed 32/1280 stem/head
            stages_cfg = list(_B0_STAGES)
            stem_c, head_c = 32, 1280
        elif name in _B_MULTS:
            width, depth = _B_MULTS[name]
            stages_cfg = [
                (blk, exp, k, s, _round_channels(c * width), int(math.ceil(n * depth)))
                for (blk, exp, k, s, c, n) in _B0_STAGES
            ]
            stem_c = _round_channels(32 * width)
            head_c = 4 * stages_cfg[-1][4]
        else:
            stages_cfg = _V2_STAGES[name]
            stem_c = stages_cfg[0][4]
            head_c = 1280

        self.stem = _ConvBNAct(input_channels, stem_c, 3, stride=2, relu6=lite, rngs=rngs)
        self.stages = nnx.List([])
        cin = stem_c
        extra = {"use_se": False, "relu6": True} if lite else {}
        for blk, exp, k, s, c, n in stages_cfg:
            self.stages.append(_Stage(blk, cin, c, k, s, exp, n, rngs, **extra))
            cin = c
        self.head = _ConvBNAct(cin, head_c, 1, relu6=lite, rngs=rngs)

        # emit a pyramid level after the LAST stage at each cumulative
        # stride — this reproduces torchvision's features.{1,2,3,5,8} nodes;
        # level 5 is the 1x1 head conv output.
        cum = 2
        last_stage_at_stride = {}
        for i, (_, _, _, s, _, _) in enumerate(stages_cfg):
            cum *= s
            last_stage_at_stride[cum] = i
        self.level_stage_idx = [last_stage_at_stride[k] for k in sorted(last_stage_at_stride)]
        cs = [c for (_, _, _, _, c, _) in stages_cfg]
        chans = [cs[i] for i in self.level_stage_idx]
        chans[-1] = head_c  # level 5 is the head conv output
        self.feature_channels = chans
        # per-level module paths for freezing: ("stages", j) addresses one stage
        mods, prev = [], -1
        for li, idx in enumerate(self.level_stage_idx):
            entry = [("stages", j) for j in range(prev + 1, idx + 1)]
            if li == 0:
                entry = ["stem"] + entry
            if li == len(self.level_stage_idx) - 1:
                entry = entry + ["head"]
            mods.append(entry)
            prev = idx
        self.level_modules = mods

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = self.stem(x)
        outs = []
        emit = set(self.level_stage_idx)
        for i, stage in enumerate(self.stages):
            x = stage(x)
            if i in emit:
                outs.append(x)
        outs[-1] = self.head(x)
        return outs


def make_efficientnet_features(name, input_channels=3, *, rngs=None):
    return EfficientNetFeatures(name, input_channels=input_channels, rngs=rngs)

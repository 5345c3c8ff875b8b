"""Deep Layer Aggregation feature nets (NHWC, flax-NNX).

Architecture per Yu et al., arXiv:1707.06484 (the timm ``dla*`` models the
reference registers, ``src/sihl/timm_backbone.py:33-36``): a strided conv
base, two plain conv levels, then four hierarchical-aggregation "tree"
stages.  Each tree recursively aggregates its subtrees through root nodes
(concat -> 1x1 conv), with level-2+ roots optionally residual.

Pyramid levels (timm ``features_only`` semantics): level1 = the stride-2
conv level, levels 2-5 = the four tree stages at strides 4/8/16/32.
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import make_conv, make_norm, _rngs
from sihl_tpu.ops.image import max_pool2d


class _ConvBNReLU(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, relu=True, rngs=None):
        self.conv = make_conv(
            cin, cout, k, stride=stride, dilation=dilation, bias=False, rngs=rngs
        )
        self.bn = make_norm("batch", cout, 1, rngs)
        self.relu = relu

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return nnx.relu(x) if self.relu else x


class DlaBasic(nnx.Module):
    """Two 3x3 convs with a residual provided by the caller."""

    def __init__(self, cin, cout, stride=1, rngs=None):
        self.conv1 = _ConvBNReLU(cin, cout, 3, stride=stride, rngs=rngs)
        self.conv2 = _ConvBNReLU(cout, cout, 3, relu=False, rngs=rngs)

    def __call__(self, x, shortcut):
        return nnx.relu(self.conv2(self.conv1(x)) + shortcut)


class DlaBottleneck(nnx.Module):
    """1x1 -> 3x3 -> 1x1 with DLA's expansion of 2 (mid = cout // 2)."""

    def __init__(self, cin, cout, stride=1, rngs=None):
        mid = cout // 2
        self.conv1 = _ConvBNReLU(cin, mid, 1, rngs=rngs)
        self.conv2 = _ConvBNReLU(mid, mid, 3, stride=stride, rngs=rngs)
        self.conv3 = _ConvBNReLU(mid, cout, 1, relu=False, rngs=rngs)

    def __call__(self, x, shortcut):
        return nnx.relu(self.conv3(self.conv2(self.conv1(x))) + shortcut)


class _Root(nnx.Module):
    """Aggregation node: concat children -> 1x1 conv (+ optional residual
    of the first child)."""

    def __init__(self, cin, cout, residual, rngs=None):
        self.conv = _ConvBNReLU(cin, cout, 1, relu=False, rngs=rngs)
        self.residual = residual

    def __call__(self, children):
        out = self.conv(jnp.concatenate(children, axis=-1))
        if self.residual:
            out = out + children[0]
        return nnx.relu(out)


class _Tree(nnx.Module):
    """Recursive hierarchical aggregation (one DLA stage at depth
    ``levels``)."""

    def __init__(
        self,
        levels: int,
        block,
        cin: int,
        cout: int,
        stride: int = 1,
        root_dim: int = 0,
        root_residual: bool = False,
        level_root: bool = False,
        rngs=None,
    ):
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            # the stage input joins the root concat (all stages but the first)
            root_dim += cin
        self.levels = levels
        self.stride = stride
        self.level_root = level_root
        if levels == 1:
            self.tree1 = block(cin, cout, stride=stride, rngs=rngs)
            self.tree2 = block(cout, cout, stride=1, rngs=rngs)
            self.root = _Root(root_dim, cout, root_residual, rngs=rngs)
            self.project = (
                _ConvBNReLU(cin, cout, 1, relu=False, rngs=rngs) if cin != cout else None
            )
        else:
            self.tree1 = _Tree(
                levels - 1, block, cin, cout, stride=stride, root_dim=0,
                root_residual=root_residual, rngs=rngs,
            )
            self.tree2 = _Tree(
                levels - 1, block, cout, cout, stride=1,
                root_dim=root_dim + cout, root_residual=root_residual, rngs=rngs,
            )
            self.root = None
            self.project = None

    def __call__(self, x, children: Optional[list] = None):
        children = [] if children is None else children
        bottom = max_pool2d(x, self.stride, stride=self.stride) if self.stride > 1 else x
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            shortcut = self.project(bottom) if self.project is not None else bottom
            x1 = self.tree1(x, shortcut)
            x2 = self.tree2(x1, x1)
            return self.root([x2, x1] + children)
        x1 = self.tree1(x)
        children.append(x1)
        return self.tree2(x1, children=children)


# name -> (levels per stage 2..5, channels, bottleneck?, residual roots?)
DLA_CONFIGS = {
    "dla34": ((1, 2, 2, 1), (64, 128, 256, 512), False, False),
    "dla60": ((1, 2, 3, 1), (128, 256, 512, 1024), True, False),
    "dla102": ((1, 3, 4, 1), (128, 256, 512, 1024), True, True),
    "dla169": ((2, 3, 5, 1), (128, 256, 512, 1024), True, True),
}


class DlaFeatures(nnx.Module):
    def __init__(self, name: str, input_channels: int = 3, *, rngs: Optional[nnx.Rngs] = None):
        rngs = _rngs(rngs)
        levels, channels, bottleneck, root_res = DLA_CONFIGS[name]
        block = DlaBottleneck if bottleneck else DlaBasic
        self.base = _ConvBNReLU(input_channels, 16, 7, rngs=rngs)
        self.level0 = _ConvBNReLU(16, 16, 3, rngs=rngs)
        self.level1 = _ConvBNReLU(16, 32, 3, stride=2, rngs=rngs)
        cin = 32
        self.stages = nnx.List([])
        for i, (lv, c) in enumerate(zip(levels, channels)):
            self.stages.append(
                _Tree(
                    lv, block, cin, c, stride=2, root_residual=root_res,
                    level_root=i > 0, rngs=rngs,
                )
            )
            cin = c
        self.feature_channels = [32] + list(channels)
        self.level_modules = [
            ["base", "level0", "level1"],
            [("stages", 0)],
            [("stages", 1)],
            [("stages", 2)],
            [("stages", 3)],
        ]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x = self.level1(self.level0(self.base(x)))
        outs = [x]
        for stage in self.stages:
            x = stage(x)
            outs.append(x)
        return outs


def make_dla_features(name, input_channels=3, *, rngs=None):
    return DlaFeatures(name, input_channels=input_channels, rngs=rngs)

"""ResNet / ResNeXt / WideResNet feature nets (torchvision-compatible
structure, NHWC, flax-NNX).

Level semantics match the reference registry
(``src/sihl/torchvision_backbone.py:42-55``): level1 is the stem relu
output (stride 2), level2..5 are layer1..layer4 outputs (strides 4..32).
Structure mirrors torchvision ResNet v1.5 (stride in the bottleneck 3x3) so
pretrained torchvision weights can be ported 1:1.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import (
    make_conv,
    make_norm,
    maybe_split_norm_input,
    _rngs,
)
from sihl_tpu.ops.image import max_pool2d
from sihl_tpu.ops.relu import relu


class _ConvBN(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, rngs=None):
        self.conv = make_conv(cin, cout, k, stride=stride, groups=groups, bias=False, rngs=rngs)
        self.bn = make_norm("batch", cout, 1, rngs)

    def __call__(self, x):
        return self.bn(maybe_split_norm_input(self.conv(x)))


class BasicBlock(nnx.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1, groups=1, base_width=64, *, rngs=None):
        assert groups == 1 and base_width == 64, "BasicBlock only supports groups=1"
        self.conv1 = _ConvBN(in_planes, planes, 3, stride=stride, rngs=rngs)
        self.conv2 = _ConvBN(planes, planes, 3, rngs=rngs)
        self.downsample = (
            _ConvBN(in_planes, planes, 1, stride=stride, rngs=rngs)
            if (stride != 1 or in_planes != planes)
            else None
        )

    def __call__(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = relu(self.conv1(x))
        out = self.conv2(out)
        return relu(out + identity)


class Bottleneck(nnx.Module):
    expansion = 4

    def __init__(self, in_planes, planes, stride=1, groups=1, base_width=64, *, rngs=None):
        width = int(planes * (base_width / 64.0)) * groups
        out_planes = planes * self.expansion
        self.conv1 = _ConvBN(in_planes, width, 1, rngs=rngs)
        self.conv2 = _ConvBN(width, width, 3, stride=stride, groups=groups, rngs=rngs)
        self.conv3 = _ConvBN(width, out_planes, 1, rngs=rngs)
        self.downsample = (
            _ConvBN(in_planes, out_planes, 1, stride=stride, rngs=rngs)
            if (stride != 1 or in_planes != out_planes)
            else None
        )

    def __call__(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        out = relu(self.conv1(x))
        out = relu(self.conv2(out))
        out = self.conv3(out)
        return relu(out + identity)


class _Stage(nnx.Module):
    def __init__(self, block, in_planes, planes, num_blocks, stride, groups, base_width, rngs):
        self.blocks = nnx.List([])
        for i in range(num_blocks):
            self.blocks.append(
                block(
                    in_planes if i == 0 else planes * block.expansion,
                    planes,
                    stride=stride if i == 0 else 1,
                    groups=groups,
                    base_width=base_width,
                    rngs=rngs,
                )
            )

    def __call__(self, x):
        for b in self.blocks:
            x = b(x)
        return x


def _stem_space_to_depth(x, kernel):
    """The 7x7/s2 stem conv computed as a 4x4/s1 conv over the 2x2
    space-to-depth input — numerically identical, but with 4x the input
    channels (3 -> 12) so far less of each VMEM lane is padding (a
    3-channel NHWC tensor wastes most of the 128-wide lane).

    Derivation: y[i,j] = sum_{ky,kx} w[ky,kx] x[2i+ky-3, 2j+kx-3] with
    ky = 2*ty + dy - 1 maps each 7x7 tap onto a (ty in [0,4), dy in {0,1})
    pair; the (ty=0, dy=0) row/column falls outside the 7x7 kernel and is
    zero-padded.  Padding (2,1) reproduces the original pad-3 geometry.
    """
    b, h, w, c = x.shape
    x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    co = kernel.shape[-1]
    wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8, 8, c, co)
    w2 = (
        wp.reshape(4, 2, 4, 2, c, co)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * c, co)
    )
    return jax.lax.conv_general_dilated(
        x2,
        w2,
        (1, 1),
        ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _stem_batch_fold(x, kernel):
    """The 7x7/s2 stem conv with H row-groups folded into the batch axis.

    XLA vectorizes the 3-channel stem conv over BATCH lanes, so batch 16
    fills 16/128 of each vector lane and the conv runs at ~13 TF/s
    (ROOFLINE.md "convs @320^2": 2.4 ms of the flagship step).  Splitting
    H into G halo'd row-groups makes the effective batch B*G — full lanes
    at G = 128/B — for the cost of one ~7%-bigger halo'd copy of the
    input.  Bit-exact vs the direct conv (same contraction order);
    autodiff-safe (plain slices/concat/conv).
    """
    b, h, w, c = x.shape
    co = kernel.shape[-1]
    groups = max(1, min(128 // b, h // 2))
    while (h // 2) % groups:
        groups -= 1
    if groups <= 1:
        return None
    rows = h // 2 // groups  # output rows per group
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    xg = jnp.stack(
        [xp[:, 2 * rows * g : 2 * rows * g + 2 * rows + 6] for g in range(groups)],
        axis=1,
    ).reshape(b * groups, 2 * rows + 6, w + 6, c)
    y = jax.lax.conv_general_dilated(
        xg, kernel, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, h // 2, w // 2, co)


class _Stem(nnx.Module):
    def __init__(self, input_channels, rngs):
        self.conv = make_conv(input_channels, 64, 7, stride=2, padding=3, bias=False, rngs=rngs)
        self.bn = make_norm("batch", 64, 1, rngs)

    def _fused(self, x):
        """Fused Pallas conv+stats path (forward-only; frozen stems).

        Mirrors ``nnx.BatchNorm`` exactly: f32 fast-variance stats over the
        bf16-rounded conv output, clipped at zero, momentum running update,
        and the bf16-rounded scale/bias promotion of flax's ``_normalize``.
        """
        from sihl_tpu.ops.pallas.stem import stem_conv_stats, stem_interpret

        dtype = self.conv.dtype or x.dtype
        # tangents must never reach the kernel (it has no autodiff rules);
        # callers only take this path under a level-1 stop_gradient, so
        # killing them here changes nothing
        xs = jax.lax.stop_gradient(x.astype(dtype))
        wk = jax.lax.stop_gradient(self.conv.kernel[...].astype(dtype))
        y, s, q = stem_conv_stats(xs, wk, interpret=stem_interpret())
        bn = self.bn
        if bn.use_running_average:
            mean = bn.mean[...].astype(dtype).astype(jnp.float32)
            var = bn.var[...].astype(dtype).astype(jnp.float32)
        else:
            n = y.shape[0] * y.shape[1] * y.shape[2]
            mean = s / n
            var = jnp.maximum(0.0, q / n - mean * mean)
            bn.mean[...] = jax.lax.stop_gradient(
                bn.momentum * bn.mean[...] + (1 - bn.momentum) * mean
            )
            bn.var[...] = jax.lax.stop_gradient(
                bn.momentum * bn.var[...] + (1 - bn.momentum) * var
            )
        scale = bn.scale[...].astype(dtype).astype(jnp.float32)
        bias = bn.bias[...].astype(dtype).astype(jnp.float32)
        mul = jax.lax.rsqrt(var + bn.epsilon) * scale
        out = ((y.astype(jnp.float32) - mean) * mul + bias).astype(dtype)
        return relu(out)

    def __call__(self, x, fwd_only: bool = False):
        import os

        if fwd_only:
            from sihl_tpu.ops.pallas.stem import stem_fused_enabled, supported

            if stem_fused_enabled() and supported(
                x.shape, self.conv.kernel[...].shape
            ):
                return self._fused(x)

        # measured on the flagship bench (b16@640, r3): 212.5 img/s with
        # s2d vs 213.4 without — a wash (XLA handles the 3-channel stem as
        # well as the rearranged 12-channel one), so the rewrite ships
        # opt-in; parity is tested either way
        if (
            os.environ.get("SIHL_TPU_STEM_S2D", "0") == "1"
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            dtype = self.conv.dtype or x.dtype
            y = _stem_space_to_depth(
                x.astype(dtype), self.conv.kernel[...].astype(dtype)
            )
        elif (
            os.environ.get("SIHL_TPU_STEM_FOLD", "0") == "1"
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            dtype = self.conv.dtype or x.dtype
            y = _stem_batch_fold(
                x.astype(dtype), self.conv.kernel[...].astype(dtype)
            )
            if y is None:  # degenerate geometry: plain conv
                y = self.conv(x)
        else:
            y = self.conv(x)
        return relu(self.bn(maybe_split_norm_input(y)))


# -- stage-1 space-to-depth execution ---------------------------------------
#
# The 64-channel stage-1 convs only half-fill the TPU's 128-wide vector
# lanes, so XLA runs them at ~17 TFLOP/s (measured; see STATUS.md).  Folding
# pairs of image rows into channels (space-to-depth along H) doubles the
# channel dim to 128 — exactly one lane — and the 3x3/s1 convs become
# mathematically identical dense 3x3 convs over 128 channels with a derived
# block-sparse kernel.  The derived kernel carries 2x the FLOPs (half its
# C-in x C-out blocks are structural zeros) but runs at full-lane MXU rates.
# Weights stay on the original modules; the remapping is traced per step and
# is differentiable, so autodiff produces exact gradients for the original
# (3,3,64,64) kernels.
#
# MEASURED NEGATIVE (r3, v5e, tools/probe_s2d_ab.py): ResNet-50 fwd+bwd
# b16@640 frozen_levels=1 — 63.6 ms/iter with s2d vs 57.7 without.  The
# doubled FLOPs of the derived 128-ch kernel cost more than the lane-fill
# recovers (XLA's 64-ch conv is ~17 TF/s ≈ half-lane ~50% efficient, so
# 2x-FLOP full-lane execution is at best break-even before the extra
# fold/phase plumbing).  Shipped opt-in (SIHL_TPU_STAGE1_S2D=1) with CPU
# parity tests; additionally the full detection program with this flag hits
# a program-shape-specific TPU kernel fault (backbone-only and backbone+FPN
# run fine) — not worth isolating given the measured loss.


def _s2d_h(x):
    """(B, H, W, C) -> (B, H//2, W, 2C); s2d channel = phase*C + c."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w, c).transpose(0, 1, 3, 2, 4).reshape(
        b, h // 2, w, 2 * c
    )


def _s2d_h_inv(y):
    """Inverse of :func:`_s2d_h`."""
    b, h2, w, c2 = y.shape
    c = c2 // 2
    return y.reshape(b, h2, w, 2, c).transpose(0, 1, 3, 2, 4).reshape(
        b, 2 * h2, w, c
    )


def _conv3x3_kernel_s2d(wk):
    """Remap a (3,3,C,Co) s1/p1 conv kernel onto the s2d-H domain.

    Output original row ``2i+po`` reads original rows ``2i+po-1+ky``; writing
    ``t = po+ky-1 = 2*delta + pi`` gives the s2d cell offset ``delta`` and
    input phase ``pi`` for each tap.  Result: (3, 3, 2C, 2Co), half of whose
    (C, Co) blocks are zero.
    """
    _, kw, c, co = wk.shape
    k = jnp.zeros((3, kw, 2 * c, 2 * co), wk.dtype)
    # po=0 outputs -> s2d out channels [0:co]
    k = k.at[0, :, c:, :co].set(wk[0])  # ky=0: cell -1, phase 1
    k = k.at[1, :, :c, :co].set(wk[1])  # ky=1: cell 0, phase 0
    k = k.at[1, :, c:, :co].set(wk[2])  # ky=2: cell 0, phase 1
    # po=1 outputs -> s2d out channels [co:]
    k = k.at[1, :, :c, co:].set(wk[0])  # ky=0: cell 0, phase 0
    k = k.at[1, :, c:, co:].set(wk[1])  # ky=1: cell 0, phase 1
    k = k.at[2, :, :c, co:].set(wk[2])  # ky=2: cell +1, phase 0
    return k


def _pw_s2d(x2, conv):
    """Apply a 1x1 conv's kernel per-phase on an s2d-H tensor.

    A 1x1 conv is pixelwise, so it commutes with the row->channel fold: fold
    the phase into the row dim and contract over C only.
    """
    b, h2, w, c2 = x2.shape
    wk = conv.kernel[...]
    c = wk.shape[2]
    wk = wk[0, 0].astype(x2.dtype)
    y = jnp.einsum("bhwpc,cd->bhwpd", x2.reshape(b, h2, w, 2, c), wk)
    return y.reshape(b, h2, w, -1)


def _bn_s2d(bn, x2):
    """Run an ``nnx.BatchNorm`` on the (...,2,C) view so batch statistics
    reduce over the folded phase dim too — identical stats and running-stat
    updates to the unfolded layout."""
    b, h2, w, c2 = x2.shape
    return bn(x2.reshape(b, h2, w, 2, c2 // 2)).reshape(b, h2, w, c2)


def _bottleneck_s2d(blk, x2):
    if blk.downsample is not None:
        identity = _bn_s2d(blk.downsample.bn, _pw_s2d(x2, blk.downsample.conv))
    else:
        identity = x2
    out = relu(_bn_s2d(blk.conv1.bn, _pw_s2d(x2, blk.conv1.conv)))
    k2 = _conv3x3_kernel_s2d(blk.conv2.conv.kernel[...].astype(out.dtype))
    y = jax.lax.conv_general_dilated(
        out, k2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = relu(_bn_s2d(blk.conv2.bn, y))
    out = _bn_s2d(blk.conv3.bn, _pw_s2d(out, blk.conv3.conv))
    return relu(out + identity)


def _stage_s2d_eligible(stage, x):
    if x.shape[1] % 2 != 0:
        return False
    for blk in stage.blocks:
        if not isinstance(blk, Bottleneck):
            return False
        if blk.conv2.conv.strides not in (1, (1, 1)):
            return False
        if blk.conv2.conv.feature_group_count != 1:
            return False
    return True


def _stage_s2d(stage, x):
    x2 = _s2d_h(x)
    for blk in stage.blocks:
        x2 = _bottleneck_s2d(blk, x2)
    return _s2d_h_inv(x2)


class ResNetFeatures(nnx.Module):
    """Feature-pyramid ResNet; returns levels 1..5 (strides 2..32)."""

    level_modules = [["stem"], ["layer1"], ["layer2"], ["layer3"], ["layer4"]]

    def __init__(
        self,
        block,
        layers: List[int],
        input_channels: int = 3,
        groups: int = 1,
        base_width: int = 64,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = _rngs(rngs)
        self.stem = _Stem(input_channels, rngs)
        planes = [64, 128, 256, 512]
        strides = [1, 2, 2, 2]
        in_planes = 64
        stages = []
        for p, n, s in zip(planes, layers, strides):
            stages.append(_Stage(block, in_planes, p, n, s, groups, base_width, rngs))
            in_planes = p * block.expansion
        self.layer1, self.layer2, self.layer3, self.layer4 = stages
        self.feature_channels = [64] + [p * block.expansion for p in planes]

    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        sg = getattr(self, "_sg_levels", 0)
        # a frozen stem is forward-only, which makes the fused Pallas
        # conv+BN-stats path (ops/pallas/stem.py) eligible
        c1 = self.stem(x, fwd_only=sg >= 1)
        # frozen-prefix levels carry no trainable params, so cutting the
        # gradient chain here removes their entire backward pass (the
        # high-resolution convs are the most HBM-expensive in the net)
        if sg >= 1:
            c1 = jax.lax.stop_gradient(c1)
        x = max_pool2d(c1, 3, stride=2, padding=1)
        import os

        if os.environ.get("SIHL_TPU_STAGE1_S2D", "0") == "1" and _stage_s2d_eligible(
            self.layer1, x
        ):
            c2 = _stage_s2d(self.layer1, x)
        else:
            c2 = self.layer1(x)
        if sg >= 2:
            c2 = jax.lax.stop_gradient(c2)
        c3 = self.layer2(c2)
        if sg >= 3:
            c3 = jax.lax.stop_gradient(c3)
        c4 = self.layer3(c3)
        if sg >= 4:
            c4 = jax.lax.stop_gradient(c4)
        c5 = self.layer4(c4)
        if sg >= 5:
            c5 = jax.lax.stop_gradient(c5)
        return [c1, c2, c3, c4, c5]


class PreactBottleneck(nnx.Module):
    """Pre-activation bottleneck (He et al. 2016; timm resnetv2_*)."""

    expansion = 4

    def __init__(self, in_planes, planes, stride=1, groups=1, base_width=64, *, rngs=None):
        width = int(planes * (base_width / 64.0)) * groups
        out_planes = planes * self.expansion
        self.norm1 = make_norm("batch", in_planes, 1, rngs)
        self.conv1 = make_conv(in_planes, width, 1, bias=False, rngs=rngs)
        self.norm2 = make_norm("batch", width, 1, rngs)
        self.conv2 = make_conv(width, width, 3, stride=stride, groups=groups, bias=False, rngs=rngs)
        self.norm3 = make_norm("batch", width, 1, rngs)
        self.conv3 = make_conv(width, out_planes, 1, bias=False, rngs=rngs)
        self.downsample = (
            make_conv(in_planes, out_planes, 1, stride=stride, bias=False, rngs=rngs)
            if (stride != 1 or in_planes != out_planes)
            else None
        )

    def __call__(self, x):
        pre = relu(self.norm1(x))
        identity = self.downsample(pre) if self.downsample is not None else x
        out = self.conv1(pre)
        out = self.conv2(relu(self.norm2(out)))
        out = self.conv3(relu(self.norm3(out)))
        return out + identity


class ResNetV2Features(ResNetFeatures):
    """Pre-activation ResNet; final norm-relu applied to the last stage."""

    def __init__(self, block, layers, input_channels=3, groups=1, base_width=64,
                 *, rngs=None):
        rngs = _rngs(rngs)
        super().__init__(block, layers, input_channels=input_channels,
                         groups=groups, base_width=base_width, rngs=rngs)
        self.final_norm = make_norm("batch", self.feature_channels[-1], 1, rngs)

    def __call__(self, x):
        sg = getattr(self, "_sg_levels", 0)
        c1 = self.stem(x, fwd_only=sg >= 1)
        if sg >= 1:
            c1 = jax.lax.stop_gradient(c1)
        x = max_pool2d(c1, 3, stride=2, padding=1)
        c2 = self.layer1(x)
        if sg >= 2:
            c2 = jax.lax.stop_gradient(c2)
        c3 = self.layer2(c2)
        if sg >= 3:
            c3 = jax.lax.stop_gradient(c3)
        c4 = self.layer3(c3)
        if sg >= 4:
            c4 = jax.lax.stop_gradient(c4)
        c5 = relu(self.final_norm(self.layer4(c4)))
        if sg >= 5:
            c5 = jax.lax.stop_gradient(c5)
        return [c1, c2, c3, c4, c5]


RESNET_CONFIGS = {
    "resnet18": dict(block=BasicBlock, layers=[2, 2, 2, 2]),
    "resnet26": dict(block=Bottleneck, layers=[2, 2, 2, 2]),
    "resnet34": dict(block=BasicBlock, layers=[3, 4, 6, 3]),
    "resnet50": dict(block=Bottleneck, layers=[3, 4, 6, 3]),
    "resnet101": dict(block=Bottleneck, layers=[3, 4, 23, 3]),
    "resnet152": dict(block=Bottleneck, layers=[3, 8, 36, 3]),
    "resnext50_32x4d": dict(block=Bottleneck, layers=[3, 4, 6, 3], groups=32, base_width=4),
    "resnext101_32x8d": dict(block=Bottleneck, layers=[3, 4, 23, 3], groups=32, base_width=8),
    "resnext101_64x4d": dict(block=Bottleneck, layers=[3, 4, 23, 3], groups=64, base_width=4),
    "wide_resnet50_2": dict(block=Bottleneck, layers=[3, 4, 6, 3], base_width=128),
    "wide_resnet101_2": dict(block=Bottleneck, layers=[3, 4, 23, 3], base_width=128),
    "resnetv2_50": dict(block=PreactBottleneck, layers=[3, 4, 6, 3], v2=True),
    "resnetv2_101": dict(block=PreactBottleneck, layers=[3, 4, 23, 3], v2=True),
}


def make_resnet_features(name: str, input_channels: int = 3, *, rngs=None) -> ResNetFeatures:
    cfg = dict(RESNET_CONFIGS[name])
    block = cfg.pop("block")
    layers = cfg.pop("layers")
    cls = ResNetV2Features if cfg.pop("v2", False) else ResNetFeatures
    return cls(block, layers, input_channels=input_channels, rngs=rngs, **cfg)

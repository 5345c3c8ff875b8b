"""Conv building blocks.

Two block orders exist in the reference and both are preserved:

* :class:`ConvNormAct` — sihl's own block, which (quirkily) applies
  **activation before norm** (conv→act→norm, reference
  ``src/sihl/layers/convblocks.py:71-85``) and defaults conv bias to
  ``norm is None``.
* :class:`StandardConvNormAct` — torchvision ``Conv2dNormActivation``
  semantics (conv→norm→act, bias = norm is None), used by FPN, the hybrid
  encoder, and detection laterals in the reference.

All convs use explicit symmetric padding ``(k-1)//2 * dilation`` so strided
convs on even inputs downsample exactly like torch (pad-then-floor).
Layout is NHWC (TPU conv-native).
"""

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.policy import compute_dtype, param_dtype

# `relu` is stock jax.nn.relu unless SIHL_TPU_RELU_OUTMASK=1 was set at
# import time, in which case it is the output-mask custom-VJP variant
# (see ops/relu.py; A/B'd as a wash on the flagship, ships opt-in OFF)
from sihl_tpu.ops.relu import relu


def _rngs(rngs: Optional[nnx.Rngs]) -> nnx.Rngs:
    return rngs if rngs is not None else nnx.Rngs(0)


# A/B switch: place an optimization_barrier between a conv and its
# BatchNorm.  The TPU trace shows XLA fusing the BN stat reduces into the
# conv epilogue, and at large spatial sizes those conv+stats fusions run
# 3-6x below the conv's standalone rate (ROOFLINE.md drill: the 1x1
# 64->256 @160^2 conv+stats fusions run at 8-18 TF/s vs the 47 TF/s
# standalone probe).  The barrier forces the conv to complete at full
# rate and the stats to run as a separate stream-rate pass, at the cost
# of one extra read of the conv output.  A *global* split measured as a
# net loss (208.6 vs 218.8 img/s — the small-spatial convs fuse well and
# barriers there only add traffic), so the switch is scoped:
#   SIHL_TPU_BN_SPLIT=0   off (default)
#   SIHL_TPU_BN_SPLIT=1   split every conv->norm edge
#   SIHL_TPU_BN_SPLIT=N   (N>1) split only when max spatial dim >= N,
#                         e.g. 80 splits the @160^2 and @80^2 convs only.
# Shapes are static under jit, so the scoping is a compile-time choice.
_BN_SPLIT = int(os.environ.get("SIHL_TPU_BN_SPLIT", "0") or "0")


def maybe_split_norm_input(x: jnp.ndarray) -> jnp.ndarray:
    """Identity; under ``SIHL_TPU_BN_SPLIT`` an optimization barrier that
    keeps XLA from fusing the following norm's stat reduces into the
    producing conv (optionally scoped to large spatial sizes)."""
    if _BN_SPLIT == 1:
        return jax.lax.optimization_barrier(x)
    if _BN_SPLIT > 1 and x.ndim == 4 and max(x.shape[1], x.shape[2]) >= _BN_SPLIT:
        return jax.lax.optimization_barrier(x)
    return x


def make_conv(
    in_channels: int,
    out_channels: int,
    kernel_size: int = 3,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding: Optional[int] = None,
    bias: bool = True,
    *,
    rngs: Optional[nnx.Rngs] = None,
) -> nnx.Conv:
    pad = padding if padding is not None else (kernel_size - 1) // 2 * dilation
    from sihl_tpu.ops.conv1x1 import DotBackwardConv

    # DotBackwardConv only engages for the 1x1/stride-1 case (see
    # ops/conv1x1.py); every other configuration is stock nnx.Conv.
    return DotBackwardConv(
        in_channels,
        out_channels,
        kernel_size=(kernel_size, kernel_size),
        strides=stride,
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=dilation,
        feature_group_count=groups,
        use_bias=bias,
        dtype=compute_dtype(),
        param_dtype=param_dtype(),
        rngs=_rngs(rngs),
    )


# SIHL_TPU_FUSED_BN=0 reverts batch norms to stock nnx.BatchNorm whose
# autodiff backward re-reads the cotangent with standalone stat reduces
# (~3.3 ms/step on the flagship bench — see ops/fused_bn.py).
_FUSED_BN = os.environ.get("SIHL_TPU_FUSED_BN", "1") == "1"


def make_norm(kind: Optional[str], num_features: int, groupnorm_groups: int, rngs):
    if kind == "batch":
        from sihl_tpu.ops.fused_bn import FusedBatchNorm

        # torch BatchNorm2d defaults: momentum 0.1 (flax convention: 0.9), eps 1e-5
        return (FusedBatchNorm if _FUSED_BN else nnx.BatchNorm)(
            num_features,
            momentum=0.9,
            epsilon=1e-5,
            dtype=compute_dtype(),
            param_dtype=param_dtype(),
            rngs=_rngs(rngs),
        )
    if kind == "group":
        return nnx.GroupNorm(
            num_features,
            num_groups=groupnorm_groups,
            epsilon=1e-5,
            dtype=compute_dtype(),
            param_dtype=param_dtype(),
            rngs=_rngs(rngs),
        )
    if kind is None:
        return None
    raise ValueError(f"unknown norm {kind!r}")


_ACTS = {
    "relu": relu,
    "silu": nnx.silu,
    "gelu": nnx.gelu,
    "sigmoid": nnx.sigmoid,
    "softplus": nnx.softplus,
    "softmax": lambda x: nnx.softmax(x, axis=-1),
    None: None,
}


class SeparableConv2d(nnx.Module):
    """Depthwise + pointwise conv pair (reference ``convblocks.py:6-34``)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        stride: int = 1,
        padding: Optional[int] = 1,
        dilation: int = 1,
        bias: bool = False,
        groups: int = 1,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = _rngs(rngs)
        self.depthwise = make_conv(
            in_channels,
            in_channels,
            kernel_size,
            stride=stride,
            padding=padding,
            dilation=dilation,
            groups=in_channels,
            bias=bias,
            rngs=rngs,
        )
        self.pointwise = make_conv(
            in_channels, out_channels, 1, groups=groups, bias=bias, rngs=rngs
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.pointwise(self.depthwise(x))


class ConvNormAct(nnx.Module):
    """sihl conv block: conv → act → norm (order preserved for parity)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        stride: int = 1,
        dilation: int = 1,
        groups: int = 1,
        padding: Optional[int] = None,
        norm: Optional[str] = "batch",
        act: Optional[str] = "relu",
        bias: Optional[bool] = None,
        separable: bool = False,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = _rngs(rngs)
        use_bias = (norm is None) if bias is None else bias
        if separable and kernel_size > 1:
            self.conv = SeparableConv2d(
                in_channels,
                out_channels,
                kernel_size,
                stride=stride,
                padding=padding
                if padding is not None
                else (kernel_size - 1) // 2 * dilation,
                dilation=dilation,
                bias=use_bias,
                groups=groups,
                rngs=rngs,
            )
        else:
            self.conv = make_conv(
                in_channels,
                out_channels,
                kernel_size,
                stride=stride,
                dilation=dilation,
                groups=groups,
                padding=padding,
                bias=use_bias,
                rngs=rngs,
            )
        self.act = act
        self.norm = make_norm(norm, out_channels, max(in_channels // 8, 1), rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv(x)
        act = _ACTS[self.act]
        if act is not None:
            x = act(x)
        if self.norm is not None:
            x = self.norm(maybe_split_norm_input(x))
        return x


class StandardConvNormAct(nnx.Module):
    """torchvision ``Conv2dNormActivation``: conv → norm → act."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        kernel_size: int = 3,
        stride: int = 1,
        dilation: int = 1,
        groups: int = 1,
        padding: Optional[int] = None,
        norm: Optional[str] = "batch",
        act: Optional[str] = "relu",
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = _rngs(rngs)
        self.conv = make_conv(
            in_channels,
            out_channels,
            kernel_size,
            stride=stride,
            dilation=dilation,
            groups=groups,
            padding=padding,
            bias=norm is None,
            rngs=rngs,
        )
        self.norm = make_norm(norm, out_channels, max(out_channels // 8, 1), rngs)
        self.act = act

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(maybe_split_norm_input(x))
        act = _ACTS[self.act]
        if act is not None:
            x = act(x)
        return x


class Identity(nnx.Module):
    def __call__(self, x):
        return x


class SequentialConvBlocks(nnx.Module):
    """N stacked conv blocks (reference ``convblocks.py:96-117``)."""

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_layers: int,
        kernel_size: int = 3,
        conv_block=ConvNormAct,
        *,
        rngs: Optional[nnx.Rngs] = None,
        **kwargs,
    ):
        rngs = _rngs(rngs)
        if num_layers <= 0:
            self.blocks = nnx.List([])
        else:
            self.blocks = nnx.List([
                conv_block(
                    in_channels if i == 0 else out_channels,
                    out_channels,
                    kernel_size=kernel_size,
                    rngs=rngs,
                    **kwargs,
                )
                for i in range(num_layers)
            ])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for block in self.blocks:
            x = block(x)
        return x

"""1x1 convolution with dot_general backward legs.

Why (TPU roofline, round 4): XLA lowers the backward of a 1x1 NHWC conv
through its conv-transpose kernels, which the flagship trace shows
running at ~400 GB/s — half the measured 826 GB/s HBM stream ceiling —
for ~2.6 ms/step at 160^2 plus ~1.6 ms at 80^2 (ROOFLINE.md drill,
``fusion.3450`` et al.).  The same contractions expressed as flat
``dot_general``s run at 730-755 GB/s on this chip
(``tools/probe_wrt_filter.py``):

    dw = x2d^T @ dy2d      (M,Ci)^T @ (M,Co) -> (Ci,Co)   [wrt-filter]
    dx = dy2d @ w2d^T      (M,Co) @ (Co,Ci)  -> (M,Ci)    [wrt-input]

The forward stays ``lax.conv_general_dilated`` so its fusion behavior
(BN-stat epilogues etc.) is unchanged; only the VJP is overridden.
Accumulation is f32 (``preferred_element_type``), cast back to the
operand dtypes — the same contract as XLA's own conv backward.

Applies to kernel 1x1, stride 1, no dilation/grouping (the ResNet
bottleneck reduce/expand convs, FPN/head laterals).  Everything else
falls back to the stock path.

MEASURED LOSS on the flagship program (2026-08-20, clean canary
232/237): 192.9 and 192.8 img/s over two legs vs 237.1 baseline.  The
standalone dots ARE 2x faster than XLA's in-program conv-backward
fusions (755 vs ~400 GB/s, ``tools/probe_wrt_filter.py``), but the
``custom_vjp`` is a fusion barrier at every one of the ~32 bottleneck
1x1 sites: XLA can no longer fuse the backward conv with the adjacent
BN-backward/ReLU chains, and the extra un-fused dy/dx HBM round-trips
cost more than the faster contraction saves.  Default is therefore
**OFF** (``SIHL_TPU_DOT_CONV1X1=1`` to opt in); kept because the
kernel-level parity tests and the probe document where the 2x sits.

Reference parity: this is a pure lowering choice; the reference's
``torch.nn.Conv2d(k=1)`` semantics (``src/sihl/layers/convblocks.py``)
are unchanged.
"""

import os

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["conv1x1", "DotBackwardConv", "make_dot_backward_conv"]

# SIHL_TPU_DOT_CONV1X1=0 (default) keeps nnx.Conv's stock autodiff
# backward — the custom-VJP swap measured as a 19% throughput LOSS on
# the flagship program (see module docstring); =1 keeps the conv
# forward and swaps only the VJP to dots; =2 additionally lowers the
# forward itself as a flat dot.
_MODE = int(os.environ.get("SIHL_TPU_DOT_CONV1X1", "0") or "0")
_ENABLED = _MODE >= 1


def _fwd_impl(x, w):
    if _MODE >= 2:
        ci, co = w.shape[2], w.shape[3]
        y2 = jax.lax.dot_general(
            x.reshape(x.size // ci, ci),
            w.reshape(ci, co),
            (((1,), (0,)), ((), ())),
        )
        return y2.reshape(x.shape[:-1] + (co,))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@jax.custom_vjp
def conv1x1(x, w):
    """NHWC 1x1 stride-1 conv; backward runs as flat dots (module doc)."""
    return _fwd_impl(x, w)


def _fwd(x, w):
    return _fwd_impl(x, w), (x, w)


def _bwd(res, dy):
    x, w = res
    ci, co = w.shape[2], w.shape[3]
    m = x.size // ci
    x2 = x.reshape(m, ci)
    dy2 = dy.reshape(m, co)
    dw = jax.lax.dot_general(
        x2, dy2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx = jax.lax.dot_general(
        dy2,
        w.reshape(ci, co),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (
        dx.astype(x.dtype).reshape(x.shape),
        dw.astype(w.dtype).reshape(w.shape),
    )


conv1x1.defvjp(_fwd, _bwd)


def _is_one(v) -> bool:
    if isinstance(v, (tuple, list)):
        return all(e == 1 for e in v)
    return v == 1


def _is_zero_pad(p) -> bool:
    if isinstance(p, str):
        return p in ("VALID", "SAME")  # identical for 1x1 stride-1
    if isinstance(p, (tuple, list)):
        return all(lo == 0 and hi == 0 for lo, hi in p)
    return p == 0


# SIHL_TPU_REMAT_POLICY=conv tags every conv output with
# jax.ad_checkpoint.checkpoint_name so the trainer can apply a
# save-only-conv-outputs rematerialization policy (BN/ReLU chains are
# recomputed in the backward instead of stashed).  The tag is only
# inserted when the policy is requested — checkpoint_name adds a jaxpr
# primitive and there is no reason to carry it otherwise.
_TAG_CONV_OUT = os.environ.get("SIHL_TPU_REMAT_POLICY", "") == "conv"


def _maybe_tag(y):
    if _TAG_CONV_OUT:
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(y, "conv_out")
    return y


class DotBackwardConv(nnx.Conv):
    """``nnx.Conv`` that routes the eligible 1x1 stride-1 case through
    :func:`conv1x1` so the backward runs as stream-rate dots."""

    def __call__(self, x):
        eligible = (
            _ENABLED
            and tuple(self.kernel_size) == (1, 1)
            and _is_one(self.strides)
            and _is_one(self.kernel_dilation)
            and _is_one(self.input_dilation)
            and self.feature_group_count == 1
            and _is_zero_pad(self.padding)
            and self.mask is None
            and x.ndim == 4
        )
        if not eligible:
            return _maybe_tag(super().__call__(x))
        w = self.kernel[...]
        b = self.bias[...] if self.use_bias else None
        if self.dtype is not None:
            x, w = x.astype(self.dtype), w.astype(self.dtype)
            b = b.astype(self.dtype) if b is not None else None
        y = conv1x1(x, w)
        if b is not None:
            y = y + b
        return _maybe_tag(y)


def make_dot_backward_conv() -> type:
    return DotBackwardConv if _ENABLED else nnx.Conv

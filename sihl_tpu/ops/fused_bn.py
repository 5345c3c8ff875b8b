"""Training-mode BatchNorm with a hand-written, fusion-friendly backward.

Why this exists (TPU roofline, not parity): the flagship train step is
HBM-bound, and XLA's autodiff of ``nnx.BatchNorm`` materializes the
incoming cotangent ``dy`` and then re-reads it with two *standalone*
reduce passes (sum(dy) and sum(dy*xhat)) before the dx pass — on the
ResNet-50+FPN step that is ~3.3 ms/step of pure tensor re-reads
(ROOFLINE.md, "reduces (stats/bias grads)" bucket).  This module defines
the same BatchNorm forward (bit-identical to ``nnx.BatchNorm`` in its
NHWC / fast-variance / no-mask / single-device configuration) with a
``jax.custom_vjp`` backward that expresses both stat sums directly as
reductions over elementwise functions of ``(dy, x)`` — a shape XLA
sibling-fuses into ONE streaming pass (it already does exactly this for
the forward mean/mean-of-squares pair), eliminating the dz
materialization and re-read reduces.

Gradient formulas (batch stats differentiated through, as in autodiff):

    xhat = (x - mu) * r,  r = rsqrt(var + eps)
    dbeta  = sum(dy)
    dgamma = sum(dy * xhat)
    dx = gamma * r * (dy - dbeta/N - xhat * dgamma/N)

Sums accumulate in f32 (the autodiff path accumulated the stat reduces
in bf16 — this is strictly better numerics at the same traffic).

Reference behavior being preserved: torch ``BatchNorm2d`` training-mode
semantics as wrapped by the reference's conv blocks
(``src/sihl/layers/convblocks.py:71-85``); running-stat momentum and
eps handling live in the caller (`sihl_tpu.layers.convblocks.make_norm`).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

__all__ = ["bn_train_apply", "FusedBatchNorm"]


@functools.lru_cache(maxsize=None)
def _make_bn_apply(eps: float, out_dtype: jnp.dtype):
    """Build the custom-vjp training-mode BN apply for a given (eps, dtype).

    The returned function maps ``(x, scale, bias) -> (y, mean, var)`` where
    ``x`` is channel-last (..., C) and stats reduce over all leading axes.
    ``mean``/``var`` are f32 batch stats (for the caller's running-stat
    update, which the caller must wrap in stop_gradient — their cotangents
    are ignored by the custom backward).
    """

    def _stats(x):
        # mirrors flax _compute_stats: f32, fast variance, clipped
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mu = xf.mean(axes)
        mu2 = (xf * xf).mean(axes)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        return mu, var

    def _apply(x, scale, bias):
        mu, var = _stats(x)
        r = jax.lax.rsqrt(var + eps)
        # mirrors flax _normalize: broadcast math in f32, cast at the end
        y = (x - mu) * (r * scale.astype(jnp.float32)) + bias.astype(
            jnp.float32
        )
        return y.astype(out_dtype), mu, var

    @jax.custom_vjp
    def bn_apply(x, scale, bias):
        return _apply(x, scale, bias)

    def fwd(x, scale, bias):
        y, mu, var = _apply(x, scale, bias)
        r = jax.lax.rsqrt(var + eps)
        return (y, mu, var), (x, mu, r, scale)

    def bwd(res, cts):
        x, mu, r, scale = res
        dy = cts[0]  # cotangents for (mean, var) are stop_gradient'd: ignored
        n = 1
        for d in x.shape[:-1]:
            n *= d
        dyf = dy.astype(jnp.float32)
        xhat = (x.astype(jnp.float32) - mu) * r
        # both sums are reductions over elementwise((dy, x)) — XLA
        # sibling-fuses them into a single streaming pass
        dbeta = dyf.sum(tuple(range(x.ndim - 1)))
        dgamma = (dyf * xhat).sum(tuple(range(x.ndim - 1)))
        gr = scale.astype(jnp.float32) * r
        dx = gr * (dyf - dbeta / n - xhat * (dgamma / n))
        return (
            dx.astype(x.dtype),
            dgamma.astype(scale.dtype),
            dbeta.astype(scale.dtype),
        )

    bn_apply.defvjp(fwd, bwd)
    return bn_apply


def bn_train_apply(x, scale, bias, *, eps: float, out_dtype=None):
    """Training-mode BN apply with the fused backward; returns (y, mean, var)."""
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    return _make_bn_apply(float(eps), out_dtype)(x, scale, bias)


class FusedBatchNorm(nnx.BatchNorm):
    """Drop-in ``nnx.BatchNorm`` whose training-mode backward avoids XLA's
    standalone stat-reduce re-read passes (see module docstring).

    Falls back to the stock flax path whenever the configuration departs
    from the fused kernel's domain: eval mode, a stats mask, a synced
    ``axis_name``, no scale/bias, or a non-trailing feature axis.
    """

    def __call__(
        self,
        x,
        use_running_average: Optional[bool] = None,
        *,
        mask: Optional[jax.Array] = None,
    ):
        use_running_average = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        fusable = (
            use_running_average is False
            and mask is None
            and self.axis_name is None
            and self.use_fast_variance
            and self.scale is not None
            and self.bias is not None
            and self.axis in (-1, x.ndim - 1)
        )
        if not fusable:
            return super().__call__(
                x, use_running_average=use_running_average, mask=mask
            )
        dtype = self.dtype or jnp.result_type(
            x, self.scale[...], self.bias[...]
        )
        # mirror promote_dtype: compute on dtype-cast tensors
        xc = x.astype(dtype)
        scale = self.scale[...].astype(dtype)
        bias = self.bias[...].astype(dtype)
        y, mean, var = bn_train_apply(
            xc, scale, bias, eps=self.epsilon, out_dtype=dtype
        )
        self.mean[...] = jax.lax.stop_gradient(
            self.momentum * self.mean[...] + (1 - self.momentum) * mean
        )
        self.var[...] = jax.lax.stop_gradient(
            self.momentum * self.var[...] + (1 - self.momentum) * var
        )
        return y

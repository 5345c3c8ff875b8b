"""ReLU with an output-mask backward (residual-stash byte reduction).

Why this exists (TPU roofline, not parity): ``jax.nn.relu``'s JVP rule
keeps the relu *input* as the backward residual (``jnp.where(x > 0, g,
0)``).  In the flagship ResNet-50 train step every bottleneck chain is
``conv -> BatchNorm -> relu``; the BN output feeds *only* the relu, so
without this op the forward pass must materialize BOTH the BN output
(relu residual) and the relu output (next conv's input) to HBM, and the
backward re-reads the BN output just to recover a sign mask.  For the
@160^2 stage-1/2 activations that is hundreds of MB/step of pure
residual traffic on an HBM-bound program (ROOFLINE.md).

``relu_outmask`` defines the gradient from the relu *output* instead:

    dx = dy * (y > 0)

which is exact — ``y = max(x, 0)`` gives ``y > 0  <=>  x > 0``, and at
the tie ``x == 0`` both formulations produce 0 gradient (stock jax relu
also defines grad(0) = 0).  The output is needed by the next layer
anyway, so the residual aliases an existing tensor and the BN output
never leaves the fusion.

Gated by ``SIHL_TPU_RELU_OUTMASK`` (default OFF until the on-chip A/B
lands; set to 1 to enable).  The switch is read at import time like the
other compile-time levers.
"""

import os

import jax
import jax.numpy as jnp

__all__ = ["relu"]


@jax.custom_vjp
def relu_outmask(x):
    return jnp.maximum(x, 0)


def _fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _bwd(y, dy):
    return (jnp.where(y > 0, dy, jnp.zeros_like(dy)),)


relu_outmask.defvjp(_fwd, _bwd)

_OUTMASK = os.environ.get("SIHL_TPU_RELU_OUTMASK", "0") == "1"

relu = relu_outmask if _OUTMASK else jax.nn.relu

"""MLP matching torchvision ``ops.MLP`` as the reference instantiates it:
``MLP(in, hidden + [out], norm_layer=LayerNorm, activation_layer=SiLU)``
(reference ``src/sihl/heads/object_detection.py:51,57-61``) — i.e. each
hidden layer is Linear → LayerNorm → SiLU and the final layer is a bare
Linear.  ``final_bias_init`` reproduces tricks like the loc head's -5 bias
(``object_detection.py:58``).
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.policy import compute_dtype, param_dtype


class MLP(nnx.Module):
    def __init__(
        self,
        in_channels: int,
        hidden_channels: Sequence[int],
        final_bias_init: Optional[float] = None,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        dims = [in_channels] + list(hidden_channels)
        self.linears = nnx.List([])
        self.norms = nnx.List([])
        for i in range(len(dims) - 1):
            self.linears.append(
                nnx.Linear(
                    dims[i],
                    dims[i + 1],
                    dtype=compute_dtype(),
                    param_dtype=param_dtype(),
                    rngs=rngs,
                )
            )
            if i < len(dims) - 2:
                self.norms.append(
                    nnx.LayerNorm(
                        dims[i + 1],
                        epsilon=1e-5,
                        dtype=compute_dtype(),
                        param_dtype=param_dtype(),
                        rngs=rngs,
                    )
                )
        if final_bias_init is not None:
            last = self.linears[-1]
            last.bias[...] = jnp.full_like(last.bias[...], final_bias_init)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, linear in enumerate(self.linears):
            x = linear(x)
            if i < len(self.norms):
                x = nnx.silu(self.norms[i](x))
        return x

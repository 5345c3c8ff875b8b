"""Scalar regression head (reference ``src/sihl/heads/regression.py``)."""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads.base import Head
from sihl_tpu.layers.convblocks import SequentialConvBlocks, make_conv, _rngs
from sihl_tpu.ops.losses import log_cosh_loss
from sihl_tpu.training import metrics as M


class Regression(Head):
    """Prediction of a scalar within a given finite interval."""

    def __init__(
        self,
        in_channels: List[int],
        lower_bound: float,
        upper_bound: float,
        level: int = 5,
        num_channels: int = 256,
        num_layers: int = 1,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert lower_bound < upper_bound
        assert num_channels > 0 and num_layers > 0
        assert level < len(in_channels)
        rngs = _rngs(rngs)
        self.level = level
        self.lower_bound = float(lower_bound)
        self.upper_bound = float(upper_bound)
        self.convs = SequentialConvBlocks(
            in_channels[level], num_channels, num_layers, rngs=rngs
        )
        self.out_conv = make_conv(num_channels, 1, 1, rngs=rngs)
        self.output_shapes = {"values": ("batch_size",)}

    def normalize(self, x):
        return (x - self.lower_bound) / (self.upper_bound - self.lower_bound)

    def denormalize(self, x):
        x = x * (self.upper_bound - self.lower_bound) + self.lower_bound
        return jnp.clip(x, self.lower_bound, self.upper_bound)

    def predict_normalized(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        # sigmoid *before* pooling, like the reference Sequential (:35-41)
        x = jax.nn.sigmoid(self.out_conv(self.convs(inputs[self.level])))
        return jnp.mean(x, axis=(1, 2, 3))

    def __call__(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        return self.denormalize(self.predict_normalized(inputs))

    def training_step(self, inputs, targets) -> Tuple[jnp.ndarray, Dict]:
        preds = self.predict_normalized(inputs)
        return jnp.mean(log_cosh_loss(preds, self.normalize(targets))), {}

    def metrics_init(self):
        return {"loss": M.mean_init(), "reg": M.regression_init()}

    def validation_step(self, state, inputs, targets):
        preds = self.predict_normalized(inputs)
        loss = jnp.mean(log_cosh_loss(preds, self.normalize(targets)))
        state = {
            "loss": M.mean_update(state["loss"], loss),
            "reg": M.regression_update(state["reg"], self.denormalize(preds), targets),
        }
        return state, loss, {}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        out = {"loss": float(M.mean_compute(state["loss"]))}
        out.update({k: float(v) for k, v in M.regression_compute(state["reg"]).items()})
        return out

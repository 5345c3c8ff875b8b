"""Multilabel classification head (reference
``src/sihl/heads/multilabel_classification.py``)."""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads.base import Head, GlobalPoolReadout
from sihl_tpu.ops.losses import binary_cross_entropy_with_logits
from sihl_tpu.training import metrics as M


class MultilabelClassification(Head):
    """Prediction of the subset of labels relevant to an input image."""

    def __init__(
        self,
        in_channels: List[int],
        num_labels: int,
        num_channels: int = 256,
        num_layers: int = 1,
        level: int = 5,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert num_labels > 0, num_labels
        assert len(in_channels) > level, (len(in_channels), level)
        assert num_channels > 0 and num_layers > 0
        self.num_labels = num_labels
        self.level = level
        self.readout = GlobalPoolReadout(
            in_channels[level], num_channels, num_labels, num_layers, rngs=rngs
        )
        self.output_shapes = {
            "scores": ("batch_size", num_labels),
            "labels": ("batch_size", num_labels),
        }

    def logits(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        return self.readout(inputs[self.level])

    def __call__(self, inputs: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # scores sorted descending with their label indices (reference :52-56)
        probs = jax.nn.sigmoid(self.logits(inputs).astype(jnp.float32))
        order = jnp.argsort(-probs, axis=1)
        return jnp.take_along_axis(probs, order, axis=1), order

    def training_step(self, inputs, target) -> Tuple[jnp.ndarray, Dict]:
        loss = jnp.mean(binary_cross_entropy_with_logits(self.logits(inputs), target))
        return loss, {}

    def metrics_init(self):
        return {"loss": M.mean_init(), "stats": M.binary_stats_init()}

    def validation_step(self, state, inputs, target):
        logits = self.logits(inputs)
        loss = jnp.mean(binary_cross_entropy_with_logits(logits, target))
        state = {
            "loss": M.mean_update(state["loss"], loss),
            "stats": M.binary_stats_update(state["stats"], logits > 0, target > 0.5),
        }
        return state, loss, {}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        out = {"loss": float(M.mean_compute(state["loss"]))}
        out.update(
            {k: float(v) for k, v in M.binary_stats_compute(state["stats"]).items()}
        )
        return out

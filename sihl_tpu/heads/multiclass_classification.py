"""Multiclass classification head (reference
``src/sihl/heads/multiclass_classification.py``)."""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads.base import Head, GlobalPoolReadout
from sihl_tpu.ops.losses import cross_entropy
from sihl_tpu.training import metrics as M


def soft_ordinal_category(labels, num_labels: int, peakiness: float = 1.0):
    """Soft labels for ordinal regression (Diaz & Marathe, CVPR 2019;
    reference ``multiclass_classification.py:100-107``)."""
    grid = jnp.arange(num_labels, dtype=jnp.float32)
    return jax.nn.softmax(
        -jnp.abs(grid[None, :] - labels[:, None].astype(jnp.float32)) * peakiness,
        axis=1,
    )


class MulticlassClassification(Head):
    """Prediction of the most probable category for an input image."""

    def __init__(
        self,
        in_channels: List[int],
        num_classes: int,
        num_channels: int = 256,
        num_layers: int = 1,
        level: int = 5,
        label_smoothing: float = 0.0,
        is_ordinal: bool = False,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert num_classes > 0, num_classes
        assert len(in_channels) > level, (len(in_channels), level)
        assert num_channels > 0 and num_layers > 0
        self.num_classes = num_classes
        self.level = level
        self.label_smoothing = label_smoothing
        self.is_ordinal = is_ordinal
        self.readout = GlobalPoolReadout(
            in_channels[level], num_channels, num_classes, num_layers, rngs=rngs
        )
        # note: the reference declares scores as (batch, num_classes)
        # (:54-57) but its forward returns the max probability per sample
        # (:59-61); we declare the true shape.
        self.output_shapes = {
            "scores": ("batch_size",),
            "classes": ("batch_size",),
        }

    def logits(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        return self.readout(inputs[self.level])

    def __call__(self, inputs: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        probs = jax.nn.softmax(self.logits(inputs).astype(jnp.float32), axis=1)
        return jnp.max(probs, axis=1), jnp.argmax(probs, axis=1)

    def _loss(self, logits, target):
        if self.is_ordinal:
            soft = soft_ordinal_category(target, self.num_classes)
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
            if self.label_smoothing > 0:
                soft = (
                    soft * (1 - self.label_smoothing)
                    + self.label_smoothing / self.num_classes
                )
            return jnp.mean(-jnp.sum(soft * log_probs, axis=1))
        return jnp.mean(
            cross_entropy(logits, target, label_smoothing=self.label_smoothing)
        )

    def training_step(self, inputs, target) -> Tuple[jnp.ndarray, Dict]:
        return self._loss(self.logits(inputs), target), {}

    def metrics_init(self):
        return {"loss": M.mean_init(), "cls": M.confusion_init(self.num_classes)}

    def validation_step(self, state, inputs, target):
        logits = self.logits(inputs)
        loss = self._loss(logits, target)
        state = {
            "loss": M.mean_update(state["loss"], loss),
            "cls": M.confusion_update(state["cls"], jnp.argmax(logits, axis=1), target),
        }
        return state, loss, {}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        out = {"loss": float(M.mean_compute(state["loss"]))}
        out.update({k: float(v) for k, v in M.confusion_compute(state["cls"]).items()})
        return out

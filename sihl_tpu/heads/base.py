"""Head protocol (reference ``src/sihl/heads/__init__.py:28-53``), TPU-functional.

A head is an NNX module with:

* ``output_shapes`` — the static-shape contract of ``__call__`` (the
  reference's ONNX contract becomes the jit/export contract here),
* ``__call__(inputs) -> outputs`` — inference, fully shape-static,
* ``training_step(inputs, *targets) -> (loss, metrics)`` — jit-pure;
  losses are computed in fp32 (the reference's autocast-off islands),
* ``metrics_init() -> state`` / ``validation_step(state, inputs, *targets)
  -> (state, loss, metrics)`` / ``validation_end(state) -> dict`` — the
  reference's stateful ``on_validation_start/step/end`` triple refactored
  into a functional metric-state protocol so the validation step jits and
  metric states reduce across devices with a plain sum.

Targets are **padded, fixed-shape** arrays (+ validity masks where
variable-length), never ragged lists — the whole step is one XLA program.
"""

from typing import Any, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.layers.convblocks import SequentialConvBlocks, make_conv, _rngs

TensorShape = Tuple[Union[str, int], ...]


class Head(nnx.Module):
    output_shapes: Dict[str, TensorShape] = {}

    def __call__(self, inputs: List[jnp.ndarray]) -> Any:
        raise NotImplementedError

    def training_step(self, inputs, *targets) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        raise NotImplementedError

    def metrics_init(self):
        return {}

    def validation_step(self, state, inputs, *targets):
        loss, metrics = self.training_step(inputs, *targets)
        return state, loss, metrics

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        """``collected`` is the host-side list of per-batch ``aux`` dicts
        returned by ``validation_step`` (for metrics like COCO mAP that
        cannot accumulate in fixed-shape device state)."""
        return {}


class GlobalPoolReadout(nnx.Module):
    """Conv tower → 1x1 conv → global average pool, shared by the
    classification/regression heads (reference pattern at
    ``multiclass_classification.py:47-52``)."""

    def __init__(
        self,
        in_channels: int,
        num_channels: int,
        num_outputs: int,
        num_layers: int,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = _rngs(rngs)
        self.convs = SequentialConvBlocks(in_channels, num_channels, num_layers, rngs=rngs)
        self.out_conv = make_conv(num_channels, num_outputs, 1, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.out_conv(self.convs(x))
        return jnp.mean(x, axis=(1, 2))

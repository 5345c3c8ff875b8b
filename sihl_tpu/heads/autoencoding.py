"""Autoencoding head (reference ``src/sihl/heads/autoencoding.py``):
encode the top level into a compact vector, decode back to image space.
Self-supervised; the target is the input image (NHWC in [0, 1])."""

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads.base import Head
from sihl_tpu.layers.convblocks import ConvNormAct, SequentialConvBlocks, _rngs
from sihl_tpu.layers.scalers import SimpleUpscaler
from sihl_tpu.ops.image import interpolate
from sihl_tpu.policy import compute_dtype, param_dtype
from sihl_tpu.training import metrics as M


class Autoencoding(Head):
    def __init__(
        self,
        in_channels: List[int],
        level: int = 5,
        num_channels: int = 256,
        num_layers: int = 3,
        representation_channels: int = 1024,
        prebottleneck_size: Tuple[int, int] = (4, 4),
        activation: Optional[str] = "sigmoid",
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert num_channels > 0 and num_layers > 0
        assert len(in_channels) > level > 0
        rngs = _rngs(rngs)
        self.level = level
        self.size = tuple(prebottleneck_size)
        self.num_channels = num_channels
        flat = num_channels * self.size[0] * self.size[1]

        self.encode_conv = ConvNormAct(in_channels[level], num_channels, 1, rngs=rngs)
        self.encode_linear = nnx.Linear(
            flat, representation_channels,
            dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs,
        )
        self.decode_linear = nnx.Linear(
            representation_channels, flat,
            dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs,
        )
        self.upscalers = nnx.List(
            SimpleUpscaler(num_channels, num_channels, rngs=rngs) for _ in range(level)
        )
        self.refine = SequentialConvBlocks(num_channels, num_channels, num_layers, rngs=rngs)
        self.out_conv = ConvNormAct(
            num_channels, in_channels[0], 1, norm=None, act=activation, rngs=rngs
        )
        self.output_shapes = {
            "reconstructions": ("batch_size", "height", "width", in_channels[0]),
            "representations": ("batch_size", representation_channels),
        }

    def __call__(self, inputs: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = inputs[self.level]
        b, h, w, _ = x.shape
        enc = interpolate(self.encode_conv(x), size=self.size, mode="bilinear")
        representations = nnx.relu(self.encode_linear(enc.reshape(b, -1)))

        dec = nnx.relu(self.decode_linear(representations))
        dec = dec.reshape(b, self.size[0], self.size[1], self.num_channels)
        dec = interpolate(dec, size=(h, w), mode="bilinear")
        for up in self.upscalers:
            dec = up(dec)
        reconstructions = self.out_conv(self.refine(dec))
        return reconstructions, representations

    def training_step(self, inputs, targets) -> Tuple[jnp.ndarray, Dict]:
        reconstructions, _ = self(inputs)
        diff = reconstructions.astype(jnp.float32) - targets.astype(jnp.float32)
        return jnp.mean(diff**2), {}

    def metrics_init(self):
        return {"loss": M.mean_init(), "reg": M.regression_init()}

    def validation_step(self, state, inputs, targets):
        reconstructions, _ = self(inputs)
        diff = reconstructions.astype(jnp.float32) - targets.astype(jnp.float32)
        loss = jnp.mean(diff**2)
        state = {
            "loss": M.mean_update(state["loss"], loss),
            "reg": M.regression_update(state["reg"], reconstructions, targets),
        }
        return state, loss, {}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        reg = M.regression_compute(state["reg"])
        return {
            "loss": float(M.mean_compute(state["loss"])),
            "mean_absolute_error": float(reg["mean_absolute_error"]),
            "mean_squared_error": float(reg["mean_squared_error"]),
        }

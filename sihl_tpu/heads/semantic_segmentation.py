"""Semantic segmentation head, PP-LiteSeg style (reference
``src/sihl/heads/semantic_segmentation.py``): SPPM context aggregation on
the top level, top-down lateral+upscale+UAFM fusion, conv tower readout.
"""

from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads.base import Head
from sihl_tpu.layers.convblocks import ConvNormAct, SequentialConvBlocks, make_conv, _rngs
from sihl_tpu.layers.scalers import SimpleUpscaler
from sihl_tpu.ops.image import interpolate
from sihl_tpu.ops.losses import cross_entropy
from sihl_tpu.training import metrics as M


class SPPM(nnx.Module):
    """Simple Pyramid Pooling Module (https://arxiv.org/abs/2204.02681).

    Pooling implemented as resize-to-size like the reference (:135-146).
    """

    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        pool_sizes: Tuple[int, ...] = (1, 2, 4),
        with_shortcut: bool = False,
        *,
        rngs=None,
    ):
        rngs = _rngs(rngs)
        self.pool_sizes = tuple(pool_sizes)
        self.with_shortcut = with_shortcut
        self.pool_convs = nnx.List(
            ConvNormAct(in_channels, out_channels, 1, rngs=rngs) for _ in self.pool_sizes
        )
        if with_shortcut:
            self.shortcut = ConvNormAct(in_channels, out_channels, 1, rngs=rngs)
        self.out_conv = ConvNormAct(out_channels, out_channels, 1, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        size = x.shape[1:3]
        fused = None
        for pool_size, conv in zip(self.pool_sizes, self.pool_convs):
            p = interpolate(x, size=(pool_size, pool_size), mode="bilinear")
            p = interpolate(conv(p), size=size, mode="bilinear")
            fused = p if fused is None else fused + p
        if self.with_shortcut:
            fused = fused + self.shortcut(x)
        return self.out_conv(fused)


class UAFM(nnx.Module):
    """Unified Attention Fusion Module (https://arxiv.org/abs/2204.02681)."""

    def __init__(self, in_channels: int, out_channels: int, *, rngs=None):
        self.conv = ConvNormAct(4, 1, norm=None, act="sigmoid", rngs=_rngs(rngs))

    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        stats = jnp.concatenate(
            [
                jnp.mean(x1, axis=-1, keepdims=True),
                jnp.max(x1, axis=-1, keepdims=True),
                jnp.mean(x2, axis=-1, keepdims=True),
                jnp.max(x2, axis=-1, keepdims=True),
            ],
            axis=-1,
        )
        alpha = self.conv(stats)
        return x1 * alpha + x2 * (1 - alpha)


class SemanticSegmentation(Head):
    """Pixelwise multiclass classification (PP-LiteSeg decoder)."""

    def __init__(
        self,
        in_channels: List[int],
        num_classes: int,
        bottom_level: int = 3,
        top_level: int = 5,
        num_channels: int = 256,
        num_layers: int = 3,
        pool_sizes: List[int] = (1, 2, 4),
        ignore_index: Union[int, None] = None,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert num_classes > 0
        assert len(in_channels) > top_level >= bottom_level > 0
        assert num_channels > 0 and num_layers >= 0
        rngs = _rngs(rngs)
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.num_channels = num_channels
        self.bottom_level = bottom_level
        self.top_level = top_level
        self.ignore_index = -100 if ignore_index is None else ignore_index
        self.rev_levels = list(reversed(range(bottom_level, top_level)))
        self.context_aggregation = SPPM(
            in_channels[top_level], num_channels, tuple(pool_sizes), rngs=rngs
        )
        self.lateral_convs = nnx.List(
            ConvNormAct(in_channels[level], num_channels, rngs=rngs)
            for level in self.rev_levels
        )
        self.upscalers = nnx.List(
            SimpleUpscaler(num_channels, num_channels, rngs=rngs) for _ in self.rev_levels
        )
        self.fusions = nnx.List(
            UAFM(num_channels, num_channels, rngs=rngs) for _ in self.rev_levels
        )
        self.out_convs = SequentialConvBlocks(
            num_channels, num_channels, num_layers, rngs=rngs
        )
        self.logit_conv = make_conv(num_channels, num_classes, 1, rngs=rngs)
        self.output_shapes = {
            "score_maps": ("batch_size", "height", "width"),
            "class_maps": ("batch_size", "height", "width"),
        }

    def get_logits(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        x = self.context_aggregation(inputs[self.top_level])
        for level, lateral, upscale, fuse in zip(
            self.rev_levels, self.lateral_convs, self.upscalers, self.fusions
        ):
            x = fuse(lateral(inputs[level]), upscale(x))
        return self.logit_conv(self.out_convs(x))

    def __call__(self, inputs: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = interpolate(self.get_logits(inputs), size=inputs[0].shape[1:3])
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.max(probs, axis=-1), jnp.argmax(probs, axis=-1)

    def _loss(self, inputs, targets):
        logits = interpolate(self.get_logits(inputs), size=targets.shape[1:3])
        ce = cross_entropy(logits, targets, ignore_index=self.ignore_index)
        valid = (targets != self.ignore_index).astype(jnp.float32)
        return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1.0), logits

    def training_step(self, inputs, targets) -> Tuple[jnp.ndarray, Dict]:
        loss, _ = self._loss(inputs, targets)
        return loss, {}

    def metrics_init(self):
        return {"loss": M.mean_init(), "seg": M.segmentation_init(self.num_classes)}

    def validation_step(self, state, inputs, targets):
        loss, logits = self._loss(inputs, targets)
        preds = jnp.argmax(logits, axis=-1)
        state = {
            "loss": M.mean_update(state["loss"], loss),
            "seg": M.segmentation_update(
                state["seg"], preds, targets, ignore_index=self.ignore_index
            ),
        }
        return state, loss, {}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        seg = M.segmentation_compute(state["seg"])
        return {
            "loss": float(M.mean_compute(state["loss"])),
            "pixel_accuracy": float(seg["accuracy"]),
            "mean_iou": float(seg["mean_iou"]),
        }

"""Non-autoregressive text recognition head, HRGA-style (reference
``src/sihl/heads/text_recognition.py``): the globally-pooled visual
encoding is repeated as L parallel queries, a transformer decoder
cross-attends over the flattened feature map, and every position is
classified in one shot (no autoregression — a single MXU-friendly pass).

Targets are padded token grids (B, L) with pad id = ``num_tokens``.
"""

import math
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import nnx

from sihl_tpu.heads.base import Head
from sihl_tpu.layers.convblocks import StandardConvNormAct, _rngs
from sihl_tpu.layers.transformer import TransformerDecoderLayer
from sihl_tpu.ops.losses import cross_entropy
from sihl_tpu.policy import compute_dtype, param_dtype
from sihl_tpu.training import metrics as M
from sihl_tpu.utils.text_metrics import token_error_rate, total_edit_distance


def sinusoidal_position_table(max_len: int, dim: int) -> np.ndarray:
    position = np.arange(max_len)[:, None]
    div_term = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class TextRecognition(Head):
    """https://arxiv.org/abs/1904.01375 (holistic-representation decoding)."""

    def __init__(
        self,
        in_channels: List[int],
        num_tokens: int,
        max_sequence_length: int,
        level: int = 3,
        num_channels: int = 256,
        num_layers: int = 1,
        num_heads: int = 4,
        embedding_dim: int = 1024,
        dropout: float = 0.1,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert num_tokens > 0 and max_sequence_length > 0
        assert level < len(in_channels)
        rngs = _rngs(rngs)
        self.num_tokens = num_tokens
        self.max_sequence_length = max_sequence_length
        self.level = level
        self.pad = num_tokens

        self.visual_encoding = StandardConvNormAct(
            in_channels[level], num_channels, 1, act="silu", rngs=rngs
        )
        self.lateral_conv = StandardConvNormAct(
            in_channels[level], num_channels, 1, act="silu", rngs=rngs
        )
        self.dropout = nnx.Dropout(rate=dropout, rngs=rngs)
        self.decoder_layers = nnx.List(
            TransformerDecoderLayer(
                num_channels, num_heads=num_heads, ff_dim=embedding_dim,
                activation="relu", norm_first=False, rngs=rngs,
            )
            for _ in range(num_layers)
        )
        self.token_projection = nnx.Linear(
            num_channels, num_tokens + 1,
            dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs,
        )
        self.pos_table = sinusoidal_position_table(max_sequence_length, num_channels)
        self.output_shapes = {
            "scores": ("batch_size", max_sequence_length),
            "tokens": ("batch_size", max_sequence_length),
        }

    def logits(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        x = inputs[self.level]
        b, h, w, _ = x.shape
        # GAP first, then the 1x1 conv block (reference Sequential :57-60)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        visual = self.visual_encoding(pooled).reshape(b, 1, -1)
        queries = jnp.broadcast_to(
            visual, (b, self.max_sequence_length, visual.shape[-1])
        )
        memory = self.lateral_conv(x).reshape(b, h * w, -1)
        y = self.dropout(queries + self.pos_table[None].astype(queries.dtype))
        for layer in self.decoder_layers:
            y = layer(y, memory)
        return self.token_projection(y)  # (B, L, num_tokens + 1)

    def __call__(self, inputs: List[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        logits = self.logits(inputs).astype(jnp.float32)
        return jnp.max(logits, axis=2), jnp.argmax(logits, axis=2)

    def training_step(self, inputs, texts) -> Tuple[jnp.ndarray, Dict]:
        """texts: (B, max_sequence_length) int tokens padded with ``num_tokens``."""
        logits = self.logits(inputs)
        loss = jnp.mean(jnp.nan_to_num(cross_entropy(logits, texts), nan=0.0))
        return loss, {}

    def metrics_init(self):
        return {"loss": M.mean_init()}

    def validation_step(self, state, inputs, texts):
        scores, tokens = self(inputs)
        loss, _ = self.training_step(inputs, texts)
        state = {"loss": M.mean_update(state["loss"], loss)}
        return state, loss, {"pred_tokens": tokens, "gt_tokens": texts}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        preds, gts = [], []
        for aux in collected:
            for p, t in zip(
                np.asarray(aux["pred_tokens"]), np.asarray(aux["gt_tokens"])
            ):
                preds.append([int(v) for v in p if v != self.pad])
                gts.append([int(v) for v in t if v != self.pad])
        matches = [p == t for p, t in zip(preds, gts)]
        return {
            "loss": float(M.mean_compute(state["loss"])),
            "token_error_rate": token_error_rate(preds, gts),
            "edit_distance": total_edit_distance(preds, gts),
            "accuracy": sum(matches) / max(len(matches), 1),
        }

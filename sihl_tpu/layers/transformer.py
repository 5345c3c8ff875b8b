"""Minimal transformer encoder/decoder layers matching the two spots the
reference uses torch transformers:

* ``HybridEncoder``: 1-layer ``nn.TransformerEncoder`` (nhead=8, ff=4c,
  dropout=0, gelu, batch_first, norm_first) on the stride-32 map
  (reference ``src/sihl/layers/hybrid_encoder.py:41-52``).
* ``TextRecognition``: ``nn.TransformerDecoder`` over character queries
  (reference ``src/sihl/heads/text_recognition.py:65-74``).

Attention rides the MXU via ``nnx.MultiHeadAttention``; all shapes static.
"""

from typing import Optional

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.policy import compute_dtype, param_dtype


def _mha(dim: int, num_heads: int, rngs: nnx.Rngs) -> nnx.MultiHeadAttention:
    return nnx.MultiHeadAttention(
        num_heads=num_heads,
        in_features=dim,
        qkv_features=dim,
        out_features=dim,
        decode=False,
        dtype=compute_dtype(),
        param_dtype=param_dtype(),
        rngs=rngs,
    )


class _FeedForward(nnx.Module):
    def __init__(self, dim: int, hidden_dim: int, activation: str, rngs: nnx.Rngs):
        self.linear1 = nnx.Linear(
            dim, hidden_dim, dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs
        )
        self.linear2 = nnx.Linear(
            hidden_dim, dim, dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs
        )
        self.activation = activation

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = {"gelu": nnx.gelu, "relu": nnx.relu, "silu": nnx.silu}[self.activation]
        return self.linear2(act(self.linear1(x)))


def _layer_norm(dim: int, rngs: nnx.Rngs) -> nnx.LayerNorm:
    return nnx.LayerNorm(
        dim, epsilon=1e-5, dtype=compute_dtype(), param_dtype=param_dtype(), rngs=rngs
    )


class TransformerEncoderLayer(nnx.Module):
    def __init__(
        self,
        dim: int,
        num_heads: int = 8,
        ff_dim: Optional[int] = None,
        activation: str = "gelu",
        norm_first: bool = True,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        ff_dim = ff_dim if ff_dim is not None else 4 * dim
        self.self_attn = _mha(dim, num_heads, rngs)
        self.ff = _FeedForward(dim, ff_dim, activation, rngs)
        self.norm1 = _layer_norm(dim, rngs)
        self.norm2 = _layer_norm(dim, rngs)
        self.norm_first = norm_first

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.norm_first:
            h = self.norm1(x)
            x = x + self.self_attn(h, h)
            x = x + self.ff(self.norm2(x))
        else:
            x = self.norm1(x + self.self_attn(x, x))
            x = self.norm2(x + self.ff(x))
        return x


class TransformerDecoderLayer(nnx.Module):
    def __init__(
        self,
        dim: int,
        num_heads: int = 8,
        ff_dim: Optional[int] = None,
        activation: str = "relu",
        norm_first: bool = False,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        rngs = rngs if rngs is not None else nnx.Rngs(0)
        ff_dim = ff_dim if ff_dim is not None else 4 * dim
        self.self_attn = _mha(dim, num_heads, rngs)
        self.cross_attn = _mha(dim, num_heads, rngs)
        self.ff = _FeedForward(dim, ff_dim, activation, rngs)
        self.norm1 = _layer_norm(dim, rngs)
        self.norm2 = _layer_norm(dim, rngs)
        self.norm3 = _layer_norm(dim, rngs)
        self.norm_first = norm_first

    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray) -> jnp.ndarray:
        if self.norm_first:
            h = self.norm1(tgt)
            tgt = tgt + self.self_attn(h, h)
            h = self.norm2(tgt)
            tgt = tgt + self.cross_attn(h, memory)
            tgt = tgt + self.ff(self.norm3(tgt))
        else:
            tgt = self.norm1(tgt + self.self_attn(tgt, tgt))
            tgt = self.norm2(tgt + self.cross_attn(tgt, memory))
            tgt = self.norm3(tgt + self.ff(tgt))
        return tgt

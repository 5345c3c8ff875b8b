"""Coordinate grids and sinusoidal position embeddings.

Behavioral parity targets: reference ``src/sihl/utils/__init__.py:91-138``
(``coordinate_grid``, ``sine_embedding_1d/2d/2d_grid``).  All shapes are
static so these trace cleanly under jit.
"""

import math

import jax.numpy as jnp


def coordinate_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """2D grid of normalized pixel-center coordinates, shape (H, W, 2) = (x, y)."""
    y_min, x_min = 1.0 / height / 2.0, 1.0 / width / 2.0
    ys = jnp.linspace(y_min, 1.0 - y_min, height, dtype=dtype)
    xs = jnp.linspace(x_min, 1.0 - x_min, width, dtype=dtype)
    xs = jnp.broadcast_to(xs[None, :], (height, width))
    ys = jnp.broadcast_to(ys[:, None], (height, width))
    return jnp.stack([xs, ys], axis=2)


def sine_embedding_1d(
    positions: jnp.ndarray, dim: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal embedding of positions; output shape positions.shape + (dim,)."""
    if dim % 2 != 0:
        raise ValueError(f"Embedding dimension must be even, got {dim}")
    positions = jnp.atleast_1d(positions).astype(jnp.float32)
    half_dim = dim // 2
    scale = math.log(temperature) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -scale)
    angles = positions[..., None] * freqs
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


def sine_embedding_2d(
    height_pos: jnp.ndarray,
    width_pos: jnp.ndarray,
    dim: int,
    temperature: float = 10000.0,
) -> jnp.ndarray:
    """2D sinusoidal embedding: half the channels embed y, half embed x."""
    if dim % 4 != 0:
        raise ValueError(f"Embedding dimension must be divisible by 4, got {dim}")
    dim_per_axis = dim // 2
    height_emb = sine_embedding_1d(height_pos, dim_per_axis, temperature)
    width_emb = sine_embedding_1d(width_pos, dim_per_axis, temperature)
    return jnp.concatenate([height_emb, width_emb], axis=-1)


def sine_embedding_2d_grid(
    height: int, width: int, dim: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """Dense (H, W, dim) sinusoidal position embedding grid."""
    y_pos = jnp.arange(height, dtype=jnp.float32)
    x_pos = jnp.arange(width, dtype=jnp.float32)
    y_grid = jnp.broadcast_to(y_pos[:, None], (height, width))
    x_grid = jnp.broadcast_to(x_pos[None, :], (height, width))
    return sine_embedding_2d(y_grid, x_grid, dim, temperature)

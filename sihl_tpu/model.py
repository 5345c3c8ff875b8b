"""Model composition (reference ``src/sihl/sihl_model.py``).

A :class:`SihlModel` is ``backbone -> (optional neck) -> [head, ...]``.
``__call__`` is the inference path: it is fully shape-static and jits into a
single XLA program (the reference's ONNX-traced path, SURVEY.md §3.2).
"""

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import nnx


class SihlModel(nnx.Module):
    """A SihlModel consists of a backbone, zero or one neck, and one or more head(s)."""

    def __init__(
        self,
        backbone: nnx.Module,
        neck: Optional[nnx.Module],
        heads: List[nnx.Module],
    ) -> None:
        self.backbone = backbone
        self.neck = neck
        self.heads = nnx.List(heads)

    def extract_features(self, input: jnp.ndarray) -> List[jnp.ndarray]:
        x = self.backbone(input)
        if self.neck is not None:
            return self.neck(x)
        return x

    def __call__(self, input: jnp.ndarray) -> List[Any]:
        x = self.extract_features(input)
        return [head(x) for head in self.heads]

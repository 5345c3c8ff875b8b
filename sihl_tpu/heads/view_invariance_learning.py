"""Barlow-Twins view-invariance head (reference
``src/sihl/heads/view_invariance_learning.py``).

The trainer re-encodes the second view through the shared trunk and passes
its pyramid as the target (``target_is_second_view``), matching the
reference's LightningModule special case (``lightning_module.py:92-93``).
"""

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads.base import Head, GlobalPoolReadout
from sihl_tpu.training import metrics as M


class ViewInvarianceLearning(Head):
    """https://arxiv.org/abs/2103.03230 (Barlow Twins)."""

    target_is_second_view = True

    def __init__(
        self,
        in_channels: List[int],
        embedding_dim: int = 1024,
        level: int = 5,
        num_channels: int = 256,
        num_layers: int = 4,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert level < len(in_channels)
        assert num_channels > 0 and num_layers > 0
        self.level = level
        self.embedding_dim = embedding_dim
        self.num_channels = num_channels
        self.projector = GlobalPoolReadout(
            in_channels[level], num_channels, embedding_dim, num_layers, rngs=rngs
        )
        self.output_shapes = {"representations": ("batch_size", embedding_dim)}

    def __call__(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        return self.projector(inputs[self.level])

    def get_correlation(self, inputs1, inputs2) -> jnp.ndarray:
        e1 = self.projector(inputs1[self.level]).astype(jnp.float32)
        e2 = self.projector(inputs2[self.level]).astype(jnp.float32)
        if e1.shape[0] > 1:
            e1 = (e1 - jnp.mean(e1, 0)) / jnp.std(e1, 0, ddof=1)
            e2 = (e2 - jnp.mean(e2, 0)) / jnp.std(e2, 0, ddof=1)
        return e1.T @ e2 / e1.shape[0]

    def training_step(self, inputs1, inputs2) -> Tuple[jnp.ndarray, Dict]:
        cc = self.get_correlation(inputs1, inputs2)
        eye = jnp.eye(cc.shape[0], dtype=cc.dtype)
        invariance = jnp.sum((cc * eye - eye) ** 2)
        # NB: the reference divides by num_channels, not embedding_dim (:71)
        redundancy = jnp.sum((cc * (1 - eye)) ** 2)
        return invariance + redundancy / self.num_channels, {}

    def metrics_init(self):
        return {
            "loss": M.mean_init(),
            "norm": M.mean_init(),
            "on_diag": M.mean_init(),
            "off_diag": M.mean_init(),
        }

    def validation_step(self, state, inputs1, inputs2):
        loss, _ = self.training_step(inputs1, inputs2)
        cc = jnp.abs(self.get_correlation(inputs1, inputs2))
        dim = cc.shape[0]
        eye = jnp.eye(dim, dtype=cc.dtype)
        norm = jnp.linalg.norm(cc - eye)
        max_diff_norm = jnp.sqrt(jnp.linalg.norm(cc) ** 2 + jnp.linalg.norm(eye) ** 2)
        on_diag = jnp.sum(cc * eye) / dim
        off_diag = jnp.sum(cc * (1 - eye)) / (dim * dim - dim)
        state = {
            "loss": M.mean_update(state["loss"], loss),
            "norm": M.mean_update(state["norm"], norm / max_diff_norm),
            "on_diag": M.mean_update(state["on_diag"], on_diag),
            "off_diag": M.mean_update(state["off_diag"], off_diag),
        }
        return state, loss, {}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        return {
            "loss": float(M.mean_compute(state["loss"])),
            "normalized_frobenius_norm": float(M.mean_compute(state["norm"])),
            "on_diagonal_mean": float(M.mean_compute(state["on_diag"])),
            "off_diagonal_mean": float(M.mean_compute(state["off_diag"])),
        }

"""(Sub-center) ArcFace metric-learning head (reference
``src/sihl/heads/metric_learning.py``).

Validation retrieves against an explicit index set populated through
``reset_validation_index_set`` / ``extend_validation_index_set`` hooks
(reference :87-99), which a user callback drives before validation.
"""

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads.base import Head
from sihl_tpu.layers.convblocks import make_conv, _rngs
from sihl_tpu.ops.losses import cross_entropy
from sihl_tpu.policy import param_dtype
from sihl_tpu.training import metrics as M
from sihl_tpu.utils import EPS


class MetricLearning(Head):
    """https://arxiv.org/abs/1801.07698 (ArcFace)."""

    def __init__(
        self,
        in_channels: List[int],
        num_identities: int,
        embedding_dim: int = 256,
        level: int = 5,
        margin: float = 0.5,
        num_subcenters: int = 1,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert num_identities > 0
        assert len(in_channels) > level
        assert embedding_dim > 0
        rngs = _rngs(rngs)
        self.num_identities = num_identities
        self.level = level
        self.num_subcenters = num_subcenters
        self.embed_conv = make_conv(in_channels[level], embedding_dim, 1, rngs=rngs)
        self.scale = math.sqrt(2) * math.log(num_identities - 1)
        self.margin = margin
        init = jax.nn.initializers.glorot_uniform(in_axis=1, out_axis=2)
        self.weight = nnx.Param(
            init(rngs.params(), (num_subcenters, embedding_dim, num_identities),
                 param_dtype())
        )
        self.index_embeddings = None
        self.index_ids = None
        self.output_shapes = {"embeddings": ("batch_size", embedding_dim)}

    def __call__(self, inputs: List[jnp.ndarray]) -> jnp.ndarray:
        x = jnp.mean(self.embed_conv(inputs[self.level]), axis=(1, 2))
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    def training_step(self, inputs, targets) -> Tuple[jnp.ndarray, Dict]:
        feats = self(inputs)  # (B, E), unit norm
        w = self.weight[...].astype(jnp.float32)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        cos_theta = jnp.max(jnp.einsum("be,sei->sbi", feats, w), axis=0)  # (B, I)
        theta = jnp.arccos(jnp.clip(cos_theta, -1 + EPS, 1 - EPS))
        one_hot = jax.nn.one_hot(targets, self.num_identities, dtype=bool)
        selected = jnp.where(theta > math.pi - self.margin, False, one_hot)
        logits = jnp.cos(jnp.where(selected, theta + self.margin, theta)) * self.scale
        return jnp.mean(cross_entropy(logits, targets)), {}

    # -- retrieval index hooks (reference :87-99) --------------------------
    def reset_validation_index_set(self) -> None:
        self.index_embeddings = None
        self.index_ids = None

    def extend_validation_index_set(self, inputs, ids) -> None:
        emb = self(inputs)
        if self.index_embeddings is None:
            self.index_embeddings = nnx.data(emb)
            self.index_ids = nnx.data(ids)
        else:
            self.index_embeddings = nnx.data(
                jnp.concatenate([self.index_embeddings, emb])
            )
            self.index_ids = nnx.data(jnp.concatenate([self.index_ids, ids]))

    def metrics_init(self):
        state = {"loss": M.mean_init(), "count": jnp.zeros((), jnp.float32)}
        for k in (1, 3, 5):
            state[f"p_at_{k}"] = M.mean_init()
            state[f"knn_{k}"] = jnp.zeros((), jnp.float32)
        state["r_precision"] = M.mean_init()
        return state

    def validation_step(self, state, inputs, targets):
        assert self.index_embeddings is not None, (
            "populate the index set via extend_validation_index_set first"
        )
        embeddings = self(inputs)
        batch = embeddings.shape[0]
        sims = embeddings @ self.index_embeddings.T  # (B, N)
        k6 = min(sims.shape[1], 6)
        top_vals, top_idx = jax.lax.top_k(sims, k6)
        top_ids = self.index_ids[top_idx]
        # drop rank-0 (self-similarity), like the reference (:124)
        relevant = (top_ids[:, 1:] == targets[:, None]).astype(jnp.float32)  # (B, <=5)
        n_cand = relevant.shape[1]

        new_state = dict(state)
        for k in (1, 3, 5):
            kk = min(k, n_cand)
            p_at_k = jnp.mean(jnp.sum(relevant[:, :kk], axis=1) / kk)
            new_state[f"p_at_{k}"] = M.mean_update(state[f"p_at_{k}"], p_at_k, batch)
            new_state[f"knn_{k}"] = state[f"knn_{k}"] + jnp.sum(relevant[:, :kk])
        # R-precision: precision at rank R where R = #relevant among candidates
        r = jnp.sum(relevant, axis=1).astype(jnp.int32)  # (B,)
        cums = jnp.cumsum(relevant, axis=1)
        r_prec = jnp.where(
            r > 0,
            jnp.take_along_axis(cums, jnp.maximum(r - 1, 0)[:, None], axis=1)[:, 0]
            / jnp.maximum(r, 1),
            0.0,
        )
        new_state["r_precision"] = M.mean_update(
            state["r_precision"], jnp.mean(r_prec), batch
        )
        new_state["count"] = state["count"] + batch
        new_state["loss"] = M.mean_update(state["loss"], 0.0)
        return new_state, jnp.zeros(()), {}

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        out = {"loss": float(M.mean_compute(state["loss"]))}
        n = max(float(state["count"]), 1.0)
        for k in (1, 3, 5):
            out[f"precision_at_{k}"] = float(M.mean_compute(state[f"p_at_{k}"]))
            out[f"{k}nn_accuracy"] = float(state[f"knn_{k}"]) / n / k
        out["r_precision"] = float(M.mean_compute(state["r_precision"]))
        return out

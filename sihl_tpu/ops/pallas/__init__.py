"""Pallas TPU kernels for ops XLA schedules poorly.

* :mod:`sihl_tpu.ops.pallas.mlp` — fused dense multi-MLP over shared
  anchor features (the detection family's per-anchor heads): hidden
  activations stay in VMEM in both directions (custom VJP with in-kernel
  recompute).  Enabled by default on TPU (``SIHL_TPU_FUSED_MLP=0`` to
  disable).
* :mod:`sihl_tpu.ops.pallas.fusion` — fused multiscale upsample+add and
  weighted-sum.  Measured *slower* than XLA's conv-adjacent fusion on the
  flagship path, so opt-in (``SIHL_TPU_PALLAS=1``); kept for large
  non-conv-adjacent fusions.

Every kernel has a pure-JAX reference implementation and parity tests
that run in interpreter mode on CPU.
"""

import os

import jax

from sihl_tpu.ops.pallas.fusion import fused_upsample_add, fused_weighted_sum
from sihl_tpu.ops.pallas.mlp import fused_mlps
from sihl_tpu.ops.pallas import mlp as _mlp


def use_fused_mlp() -> bool:
    """Fused dense-MLP kernel: on by default on TPU."""
    if os.environ.get("SIHL_TPU_FUSED_MLP", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def fused_mlp_supported(x_2d, mlps) -> bool:
    return _mlp.supported(x_2d, mlps)


__all__ = [
    "fused_upsample_add",
    "fused_weighted_sum",
    "fused_mlps",
    "fused_mlp_supported",
    "use_fused_mlp",
]

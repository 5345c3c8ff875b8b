"""Pallas TPU kernels for ops XLA schedules poorly — every kernel was
A/B-measured on the real chip and is enabled only where it wins.

* :mod:`sihl_tpu.ops.pallas.mlp` — fused dense multi-MLP over shared
  anchor features (the detection family's per-anchor heads): hidden
  activations stay in VMEM in both directions (custom VJP with in-kernel
  recompute).  Measured 9.8 vs XLA's 13.6 ms fwd+bwd at COCO scale.
  Default ON on TPU (``SIHL_TPU_FUSED_MLP=0`` disables).
* :mod:`sihl_tpu.ops.pallas.topk` — per-row k-th-largest threshold for
  anchor matching: one VMEM pass replaces a launch-latency-bound chain of
  k-1 XLA passes (~2 ms/step).  Default ON (``SIHL_TPU_FUSED_TOPK=0``).
* :mod:`sihl_tpu.ops.pallas.dynconv` — CondInst/FCPose dynamic-conv
  decode with instances lane-packed as block-diagonal weights.  Measured
  throughput-neutral (SiLU-bound) but saves ~1.7 GB of HBM
  intermediates; OPT-IN (``SIHL_TPU_DYNCONV=1``) for memory-constrained
  instance/keypoint workloads.
* :mod:`sihl_tpu.ops.pallas.fusion` — fused multiscale upsample+add and
  weighted-sum.  Measured *slower* than XLA's conv-adjacent fusion on the
  flagship path, so opt-in (``SIHL_TPU_PALLAS=1``); kept for large
  non-conv-adjacent fusions.

Every kernel has a pure-JAX reference implementation and parity tests
that run in interpreter mode on CPU.
"""

import os

import jax

from sihl_tpu.ops.pallas.dynconv import dynamic_pointwise_decode
from sihl_tpu.ops.pallas.fusion import fused_upsample_add, fused_weighted_sum
from sihl_tpu.ops.pallas.mlp import fused_mlps
from sihl_tpu.ops.pallas.topk import row_best_and_kth
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
    "dynamic_pointwise_decode",
    "fused_upsample_add",
    "fused_weighted_sum",
    "fused_mlps",
    "fused_mlp_supported",
    "row_best_and_kth",
    "use_fused_mlp",
]

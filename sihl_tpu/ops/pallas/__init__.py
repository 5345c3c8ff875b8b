"""Pallas TPU kernels for the hot multiscale ops (BASELINE.json north
star: fused FPN/BiFPN multiscale fusion).

Every kernel has a pure-JAX reference implementation and is only engaged
on TPU when shapes meet the tiling constraints; parity tests run the
kernels in interpreter mode on CPU.
"""

from sihl_tpu.ops.pallas.fusion import fused_upsample_add, fused_weighted_sum

__all__ = ["fused_upsample_add", "fused_weighted_sum"]

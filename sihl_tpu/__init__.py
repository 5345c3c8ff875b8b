"""sihl_tpu — a TPU-native reimplementation of the sihl computer-vision library.

sihl ("Simple Image Heads and Layers") composes models as
``backbone -> (optional neck) -> [head, ...]`` (reference:
``src/sihl/sihl_model.py:6-25``).  This package provides the same public
surface rebuilt TPU-first on JAX / Flax-NNX / Pallas:

* NHWC layouts everywhere (TPU conv-native),
* one jit-compiled train step (bf16 compute, fp32 loss islands),
* data parallelism via ``jax.sharding`` over a device mesh,
* fixed-shape, vmapped target assignment instead of per-image loops.

The universal inter-layer contract is the feature pyramid: a
``list[jax.Array]`` indexed by level, where ``features[0]`` is the raw
input image (NHWC) and ``features[l]`` has spatial stride ``2**l``.
"""

from sihl_tpu.policy import set_compute_dtype, compute_dtype
from sihl_tpu.model import SihlModel
from sihl_tpu.backbones import Backbone, TorchvisionBackbone, TimmBackbone, backbone_names

__version__ = "0.1.0"

__all__ = [
    "SihlModel",
    "Backbone",
    "TorchvisionBackbone",
    "TimmBackbone",
    "backbone_names",
    "set_compute_dtype",
    "compute_dtype",
]

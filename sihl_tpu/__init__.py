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
from sihl_tpu.backbones import (
    Backbone,
    TorchvisionBackbone,
    TimmBackbone,
    backbone_names,
)
from sihl_tpu.backbones import backbone_names as _bn

# name tuples mirroring the reference's public constants
# (``src/sihl/__init__.py:8-15``)
TORCHVISION_BACKBONE_NAMES = _bn()
from sihl_tpu.backbones import _TIMM_ALIASES as _ta

TIMM_BACKBONE_NAMES = tuple(sorted(_ta))


def Trainer(*args, **kwargs):
    """Lazy alias for :class:`sihl_tpu.training.Trainer` (the
    SihlLightningModule replacement)."""
    from sihl_tpu.training import Trainer as _Trainer

    return _Trainer(*args, **kwargs)

__version__ = "0.1.0"

__all__ = [
    "SihlModel",
    "Backbone",
    "TorchvisionBackbone",
    "TimmBackbone",
    "backbone_names",
    "TORCHVISION_BACKBONE_NAMES",
    "TIMM_BACKBONE_NAMES",
    "Trainer",
    "set_compute_dtype",
    "compute_dtype",
]

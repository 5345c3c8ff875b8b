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

import os as _os

# Persistent XLA compilation cache, on by default (SIHL_TPU_COMPILE_CACHE=0
# to disable, or set it to a directory to relocate).  On the tunneled TPU
# backend a cold flagship-step compile costs 10-15 min wall; the cache
# turns every repeat invocation (bench A/B legs, examples, the driver's
# compile checks) into a ~10 s reload.  Keyed by JAX on the full program +
# compile options, so stale hits are not a correctness risk.
_cache = _os.environ.get("SIHL_TPU_COMPILE_CACHE", "1")
# XLA:CPU AOT cache entries reload with spurious target-feature-mismatch
# errors (and a documented SIGILL risk), so the default-on path only
# engages when the selected platform is not the CPU; an explicit
# SIHL_TPU_COMPILE_CACHE=<dir> overrides unconditionally.
if _cache == "1" and "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
    _cache = "0"
if _cache != "0":
    if _cache == "1":
        _cache = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache")
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - very old jax
        pass

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

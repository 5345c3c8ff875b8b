"""Global mixed-precision policy.

The reference trains with Lightning ``precision="16-mixed"`` and wraps every
loss in an fp32 island (``torch.autocast(enabled=False)``, e.g. reference
``src/sihl/heads/object_detection.py:158``).  On TPU the idiom is bf16
compute / fp32 params / fp32 losses.  Modules read the policy at
construction time; losses always upcast to fp32 explicitly.
"""

from contextlib import contextmanager

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32
_PARAM_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    """Set the computation dtype used by modules constructed afterwards."""
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    return _COMPUTE_DTYPE


def param_dtype():
    return _PARAM_DTYPE


@contextmanager
def compute_dtype_scope(dtype):
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev

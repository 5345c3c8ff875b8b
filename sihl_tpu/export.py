"""Model export (SURVEY.md §3.5 — the reference's deployment story is
ONNX export of each head's static-shape forward; the TPU-native
equivalent is ``jax.export`` / StableHLO).

Because every head's ``__call__`` is fully shape-static (fixed
``max_instances`` slots, no NMS, no host sync), the whole
``SihlModel.__call__`` serializes to one portable StableHLO artifact that
any PJRT runtime (TPU, GPU, CPU) can load and run — the ONNX-parity
guarantee of the reference becomes a jit/StableHLO round-trip guarantee
here (see ``tests/test_export.py``), and a true two-runtime parity check
runs the SAME artifact on the TPU PJRT plugin and the builtin CPU PJRT
(``tools/check_export_cross_runtime.py``: counts identical, scores to
2.6e-4, boxes to 0.08 px, measured 2026-08-20).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.model import SihlModel


def exported_forward(model: SihlModel):
    """Pure jittable ``f(images) -> [head outputs...]`` with weights baked in."""
    model.eval()
    graphdef, state = nnx.split(model)

    def forward(images):
        return nnx.merge(graphdef, state)(images)

    return forward


def export_model(
    model: SihlModel,
    input_shape: Sequence[int],
    batch_polymorphic: bool = True,
    platforms: Optional[Sequence[str]] = None,
):
    """Serialize the inference forward to a ``jax.export.Exported``.

    Args:
        model: the composed model.
        input_shape: (batch, H, W, C) example input shape.
        batch_polymorphic: leave the batch dimension symbolic (the
            reference exports ONNX with a dynamic batch axis; same idea).
        platforms: lowering platforms, e.g. ("tpu", "cpu"); defaults to
            the current backend.
    """
    from jax import export as jax_export

    forward = exported_forward(model)
    if batch_polymorphic:
        dims = ",".join(["b"] + ["_"] * (len(input_shape) - 1))
        args_spec = jax.ShapeDtypeStruct(
            jax_export.symbolic_shape(dims, like=tuple(input_shape)), jnp.float32
        )
    else:
        args_spec = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jax_export.export(jax.jit(forward), **kwargs)(args_spec)


def save_exported(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())

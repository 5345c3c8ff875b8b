"""Device-mesh data parallelism (SURVEY.md §5.8).

The reference delegates distribution to Lightning DDP over NCCL; the
TPU-native replacement is explicit and tiny: a ``Mesh`` with a ``data``
axis (optionally ``model`` for tensor sharding headroom), batch arrays
sharded over ``data``, params replicated, and ``jax.jit`` inserting the
gradient ``psum`` over ICI automatically.  Because jit semantics are
global-array, batch statistics (BatchNorm) are computed over the *global*
batch — cross-replica sync-BN for free.

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``); the mesh helpers then span all hosts'
devices with the data axis laid out DCN-major so gradient reduction rides
ICI within a slice.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (no-op if already initialized or single-process).

    On a genuinely multi-process config (coordinator address or process
    count supplied) a failure is re-raised — silently degrading to
    single-host there would corrupt training semantics.  Only the
    single-process convenience path swallows the "nothing to initialize"
    errors.
    """
    multi = bool(
        kwargs.get("coordinator_address") or (kwargs.get("num_processes") or 1) > 1
    )
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        if multi:
            raise
        import warnings

        warnings.warn(f"jax.distributed.initialize skipped: {e}")


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Create a ("data", "model") mesh over the available devices.

    Degrades gracefully: if the requested factorization does not match the
    device count, the ``model`` axis collapses to 1 (with a warning) and
    ``data`` is recomputed; a still-impossible request raises ValueError.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model != 0:
            model = 1
        data = n // model
    if data * model != n:
        import warnings

        warnings.warn(
            f"make_mesh: requested data={data} x model={model} != {n} devices; "
            "collapsing model axis to 1"
        )
        model, data = 1, n
    if data * model != n or n == 0:
        raise ValueError(f"cannot build a mesh: data={data} model={model} devices={n}")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Shard every array in a batch pytree along its leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim") and x.ndim >= 1
        else x,
        batch,
    )


def shard_stacked_batch(batch, mesh: Mesh, spatial: bool = False):
    """Shard a scanned-dispatch batch pytree with a leading steps axis.

    Arrays are ``(K, B, ...)`` — K stacked per-step batches — so the batch
    dimension to shard over ``data`` is axis **1**, not axis 0 (the scan
    consumes axis 0 step by step; sharding it would split steps, not
    examples, across chips).  With ``spatial=True``, 5-D image stacks
    ``(K, B, H, W, C)`` additionally shard rows over ``model``.  1-D arrays
    (per-step scalars stacked to ``(K,)``) are replicated.
    """
    img = NamedSharding(mesh, P(None, "data", "model") if spatial else P(None, "data"))
    other = NamedSharding(mesh, P(None, "data"))
    repl = NamedSharding(mesh, P())

    def put(x):
        if not hasattr(x, "ndim"):
            return x
        if x.ndim < 2:
            return jax.device_put(x, repl)
        if x.ndim == 5:
            return jax.device_put(x, img)
        return jax.device_put(x, other)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over ``data`` AND image rows over ``model`` — spatial
    partitioning of large feature maps (the vision analog of sequence
    parallelism, SURVEY.md §5.7).  Under jit's global-array semantics XLA
    inserts conv halo exchanges automatically."""
    return NamedSharding(mesh, P("data", "model"))


def shard_batch_spatial(batch, mesh: Mesh):
    """Shard image arrays (B, H, W, C) over (data, model); other arrays
    over data only."""
    img = spatial_sharding(mesh)
    other = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, img if getattr(x, "ndim", 0) == 4 else other)
        if hasattr(x, "ndim") and x.ndim >= 1
        else x,
        batch,
    )

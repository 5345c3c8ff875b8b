"""Shared detection-family machinery (SURVEY.md §2.3, §7).

All four detection-family heads (object / instance / keypoint / quad)
build the same normalized cell-center anchor grid (reference
``src/sihl/heads/object_detection.py:83-97``, duplicated at
``instance_segmentation.py:90-104``, ``keypoint_detection.py:91-105``,
level-id variant ``quadrilateral_detection.py:92-108``), flatten per-level
1x1 laterals into one anchor list, and run per-anchor MLPs over it.  The
reference duplicates this in every head; here it lives once.
"""

import os
from typing import List, Sequence, Tuple

import jax.numpy as jnp

# A/B switch: gather per-image anchor rows as one flat row gather over the
# (B*A, C) view instead of take_along_axis on axis 1 of (B, A, C).  The
# TPU trace shows XLA materializing a (B,A,C)->(A,B,C) transpose copy
# (plus its scatter-transpose in the backward) around the axis-1 gather;
# the flat row gather keeps everything in the (B*A, C) row-major layout
# the fused-MLP kernel consumes anyway.  On-chip A/B (2 reps each):
# flat 219.4/219.6 vs axis-1 218.8/219.1 img/s -- small consistent win,
# default ON; set SIHL_TPU_FLAT_GATHER=0 to restore take_along_axis.
_FLAT_GATHER = os.environ.get("SIHL_TPU_FLAT_GATHER", "1") == "1"

# Pad the flattened anchor dim to a multiple of this at concat time
# (0 disables).  COCO-scale anchor counts (e.g. 8525 for levels 3-7 at
# 640px) are not sublane-aligned, so every (B, A, C) <-> (B*A, C) reshape
# around the fused-MLP kernel is a real relayout copy (~0.37 ms/step of
# pure HBM round-trips on the flagship trace: reshape.2285/.2308 in
# ROOFLINE.md's data-formatting bucket).  With A padded to a multiple of
# 256 the reshape is a free bitcast AND the backward kernel's row count
# becomes divisible by its preferred 1024-row tile.  Zero-padded rows are
# sliced off every dense MLP output (``run_mlps(num_valid=...)``), never
# enter gathers (indices < A), and contribute exactly zero cotangent, so
# outputs and gradients are bit-identical to the unpadded program.
# On-chip A/B 2026-08-19 (flagship bench): pad256 + 512-row bwd tiles
# 237.0/237.1 img/s vs unpadded 235.6 — default ON.
_ANCHOR_PAD = int(os.environ.get("SIHL_TPU_ANCHOR_PAD", "256") or "0")


def gather_anchor_rows(
    feats: jnp.ndarray, idx: jnp.ndarray, sorted_unique: bool = False
) -> jnp.ndarray:
    """Per-image row gather from (B, A, C) features with (B, k) indices.

    Semantically identical to
    ``jnp.take_along_axis(feats, idx[..., None], axis=1)``.

    ``sorted_unique=True`` asserts that each image's indices are strictly
    increasing (hence unique) — the caller must guarantee it (e.g. top-k
    indices re-sorted ascending).  The flags propagate to the transposed
    scatter-add in the backward, which lets XLA skip duplicate handling
    and use an ordered update loop.
    """
    if not _FLAT_GATHER:
        return jnp.take_along_axis(feats, idx[..., None], axis=1)
    b, a, c = feats.shape
    rows = (jnp.arange(b, dtype=idx.dtype)[:, None] * a + idx).reshape(-1)
    flat = jnp.take(
        feats.reshape(b * a, c),
        rows,
        axis=0,
        indices_are_sorted=sorted_unique,
        unique_indices=sorted_unique,
    )
    return flat.reshape(b, idx.shape[1], c)


def sort_positives(pos_w: jnp.ndarray, pos_idx: jnp.ndarray):
    """Reorder per-image top-k positives ascending by anchor index.

    The positive-anchor losses are permutation-invariant sums, so this
    changes nothing semantically, but it makes the downstream feature
    gather (and its backward scatter-add) sorted-and-unique, letting XLA
    drop duplicate handling (A/B on the flagship config: neutral, 232.6/
    233.1 vs 232.9 img/s — kept because it is free and strictly more
    information for the compiler).
    """
    order = jnp.argsort(pos_idx, axis=1)
    return (
        jnp.take_along_axis(pos_w, order, axis=1),
        jnp.take_along_axis(pos_idx, order, axis=1),
    )


def _level_grid(feature) -> Tuple[jnp.ndarray, jnp.ndarray, float, float]:
    """Normalized pixel-center coordinate vectors for one feature map."""
    h, w = feature.shape[1:3]
    y_min, x_min = 1.0 / h / 2.0, 1.0 / w / 2.0
    ys = jnp.linspace(y_min, 1 - y_min, h, dtype=jnp.float32)
    xs = jnp.linspace(x_min, 1 - x_min, w, dtype=jnp.float32)
    xg = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
    yg = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
    return xg, yg, x_min, y_min


def cell_anchors(inputs, levels) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized cell-center offsets (A, 4) and cell-box scales (A, 4)
    over all ``levels`` (reference ``object_detection.py:83-97``)."""
    offsets, scales = [], []
    for level in levels:
        xg, yg, x_min, y_min = _level_grid(inputs[level])
        offsets.append(jnp.stack([xg, yg, xg, yg], axis=1))
        cell = jnp.array([-x_min, -y_min, x_min, y_min], jnp.float32)
        scales.append(jnp.broadcast_to(cell[None, :], (xg.shape[0], 4)))
    return jnp.concatenate(offsets), jnp.concatenate(scales)


def cell_centers_with_levels(inputs, levels) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quad-head variant (reference ``quadrilateral_detection.py:92-108``):
    per-anchor cell centers tiled to the 4 vertices (A, 8) plus the anchor's
    pyramid level id (A, 1)."""
    rel_offsets, level_ids = [], []
    for level in levels:
        xg, yg, _, _ = _level_grid(inputs[level])
        grid = jnp.stack([xg, yg], axis=1)
        rel_offsets.append(jnp.tile(grid, (1, 4)))
        level_ids.append(jnp.full((xg.shape[0], 1), level, jnp.float32))
    return jnp.concatenate(rel_offsets), jnp.concatenate(level_ids)


def num_anchors(inputs, levels) -> int:
    """True (unpadded) anchor count over ``levels`` — the anchor-axis
    length of :func:`cell_anchors`, for slicing padded MLP outputs."""
    return sum(inputs[level].shape[1] * inputs[level].shape[2] for level in levels)


def flatten_laterals(inputs, levels, laterals, num_channels, extra=None):
    """Apply per-level 1x1 laterals and flatten into one (B, Ap, C) anchor
    list; ``extra`` is an optional broadcastable addend (the quad head's
    global context).

    ``Ap`` is the true anchor count padded up to ``SIHL_TPU_ANCHOR_PAD``
    (zero rows appended by the same concatenate that builds the list, so
    the padding costs no extra pass).  Callers slice dense per-anchor MLP
    outputs back to the true count via ``run_mlps(..., num_valid=A)``;
    anchor-row gathers are unaffected (indices are always < A).
    """
    feats = []
    for level, lateral in zip(levels, laterals):
        f = lateral(inputs[level])
        if extra is not None:
            f = f + extra
        feats.append(f)
    b = feats[0].shape[0]
    flat = [x.reshape(b, -1, num_channels) for x in feats]
    if _ANCHOR_PAD:
        a = sum(x.shape[1] for x in flat)
        pad = (-a) % _ANCHOR_PAD
        if pad:
            flat.append(jnp.zeros((b, pad, num_channels), flat[0].dtype))
    return jnp.concatenate(flat, axis=1)


def run_mlps(x, mlps, *, num_valid: int) -> List[jnp.ndarray]:
    """Run several per-anchor MLPs over shared (B, A, C) features.

    On TPU this is one fused Pallas pass per call — every MLP's weights
    live in VMEM and hidden activations never touch HBM
    (``ops/pallas/mlp.py``); elsewhere the plain module chain.

    ``num_valid`` slices the anchor axis of every output back to the true
    anchor count when ``x`` carries :func:`flatten_laterals` padding.  It
    is REQUIRED (pass ``x.shape[1]`` for inputs known to be unpadded,
    e.g. gathered anchor rows) so a dense call over padded features can
    never silently keep zero-pad rows in its outputs — padded logits
    entering ``top_k`` could select pad rows for heads without the -5
    loc bias (advisor finding, round 3).
    """
    assert isinstance(num_valid, int) and 0 < num_valid <= x.shape[1], (
        num_valid,
        x.shape,
    )
    from sihl_tpu.ops import pallas as P

    b, a, c = x.shape
    x2 = x.reshape(b * a, c)
    if P.use_fused_mlp() and P.fused_mlp_supported(x2, mlps):
        outs = P.fused_mlps(x2, mlps)
    else:
        outs = [m(x2) for m in mlps]
    outs = [o.reshape(b, a, -1) for o in outs]
    if num_valid != a:
        outs = [o[:, :num_valid] for o in outs]
    return outs

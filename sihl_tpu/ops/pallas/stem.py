"""Fused ResNet-stem conv (7x7/s2/p3) + BatchNorm batch-stat sums.

Why: the stem conv's 3-channel input starves the TPU's 128-wide lanes, so
XLA runs it at ~13% of the memory ceiling (2.4 ms of the 72 ms flagship
step; see ROOFLINE.md "convs @320^2"), and the scan feed pays another
~0.6 ms relayout copy into the conv's preferred batch-minor layout.  This
kernel computes the conv as big-K patch matmuls — the 7x7xC taps become a
K = 7*4*2C contraction the MXU runs at full rate — and folds the
BatchNorm batch-stat sums (needed because the reference's level-freeze
keeps BN in train mode: ``src/sihl/torchvision_backbone.py:189-210`` only
clears ``requires_grad``) into the same pass.

Geometry (stride 2, kernel 7, pad 3, C input channels, chunk = 2C):
  - XLA-side prep reshapes the image row-flat (B, H, W*C), zero-pads it
    (3C left, a 4-row top margin) so output column j's patch starts at
    flat chunk j and tap (i, ky) reads padded row 2i + ky + 1 exactly —
    the zero pads ARE the conv padding, no masks anywhere — then splits
    rows by parity and lanes by phase-mod-chunk into
    (B, 2, chunk, HP/2, W2+3).  One fused HBM pass, replacing the
    relayout copy XLA otherwise inserts in front of its own conv.
  - In-kernel (grid (B, H2/R)): each step sees two adjacent R-row blocks
    per parity (the halo is covered by indexing row-blocks j and j+1).
    Every patch column (ky, u, v) is then a contiguous slab
    ``parity[v, a_ky : a_ky+R, u : u+W2]`` — full-lane slices only, no
    lane-granular reshapes (Mosaic rejects those) — stacked along the
    new MAJOR axis into S (K, R, W2) and contracted with the remapped
    (K, CO) kernel over the K sublane dim (the same transposed-lhs
    ``dot_general`` form every wgrad uses).
  - Per-channel sum / sum-of-squares of the bf16-rounded conv output are
    accumulated across the sequential TPU grid into two (1, CO) f32
    outputs (bit-matching what BatchNorm computes from the conv output).

The kernel is forward-only (no custom VJP): the flagship config freezes
level 1, so the stem sits under ``stop_gradient`` and autodiff never
requests its transpose.  Callers must gate on that (see
``backbones/resnet.py``).
"""

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

KY = 7  # kernel height/width (7x7), stride 2, pad 3 — the ResNet stem
KX = 7
STRIDE = 2
PAD = 3


def stem_fused_enabled() -> bool:
    """Opt-in: ``SIHL_TPU_STEM_FUSED=1`` enables the fused stem on TPU.

    Default OFF — measured LOSS on chip: XLA's stem conv runs the probe
    workload in 10.66 ms vs 15.3-15.4 ms for this kernel (both row
    tilings; tools/probe_stem_kernel.py, b16@640). CPU parity is 1-2 ULP,
    so the kernel is kept as a correct reference implementation only.
    ``SIHL_TPU_STEM_FUSED=interpret`` forces the path on any backend in
    Pallas interpreter mode (CPU parity tests).
    """
    gate = os.environ.get("SIHL_TPU_STEM_FUSED", "0")
    if gate == "interpret":
        return True
    if gate != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def stem_interpret() -> bool:
    """Whether the fused stem should run in Pallas interpreter mode."""
    return os.environ.get("SIHL_TPU_STEM_FUSED", "1") == "interpret"


def supported(x_shape, w_shape) -> bool:
    """Fused path eligibility: the torchvision stem geometry, even H/W,
    a row-tile that divides H/2, and a lane-friendly channel count."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    b, h, w, c = x_shape
    kh, kw, wc, co = w_shape
    if (kh, kw) != (KY, KX) or wc != c:
        return False
    if h % 2 or w % 2:
        return False
    if c > 8:  # patch chunks stay tiny; wide inputs belong to XLA's conv
        return False
    if co % 8:
        return False
    return _pick_rows(h // 2) is not None


def _pick_rows(h2: int) -> Optional[int]:
    for rows in (16, 8, 4):
        if h2 % rows == 0:
            return rows
    return None


def _remap_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(KY, KX, C, CO) -> (KY*4*2C, CO) patch-matmul weights.

    Patch column (ky, u, v) with u in [0,4), v in [0,2C) holds input flat
    element 2uC + v - 3C of the row window, i.e. tap kx = 2u + v//C,
    channel v%C; kx == 7 falls outside the 7-wide kernel and gets zeros.
    """
    ky, kx, c, co = w.shape
    wp = jnp.pad(w, ((0, 0), (0, 1), (0, 0), (0, 0)))  # kx: 7 -> 8 (zeros)
    # (KY, 8, C, CO) -> (KY, u=4, v=2C, CO): kx = 2u + (v // C)
    wr = wp.reshape(ky, 4, 2, c, co).reshape(ky, 4, 2 * c, co)
    return wr.reshape(ky * 4 * 2 * c, co)


def _stem_kernel(
    e0_ref, e1_ref, o0_ref, o1_ref, w_ref, y_ref, sum_ref, ssq_ref,
    *, rows, w2, c, unroll_m,
):
    chunk = 2 * c
    ev = jnp.concatenate([e0_ref[0, 0], e1_ref[0, 0]], axis=1)  # (chunk, 2R, 323')
    od = jnp.concatenate([o0_ref[0, 0], o1_ref[0, 0]], axis=1)
    slabs = []
    for ky in range(KY):
        # tap row for output i is padded row 2i + ky + 1 (see module doc)
        if ky % 2 == 0:
            src, a = od, ky // 2
        else:
            src, a = ev, (ky + 1) // 2
        for u in range(4):
            for v in range(chunk):
                slabs.append(src[v, a : a + rows, u : u + w2])
    s_mat = jnp.stack(slabs, axis=0)  # (K, R, W2), K-major stack is cheap
    if unroll_m:
        # R separate (K, W2)^T @ (K, CO) matmuls — contraction over the K
        # sublane dim, the canonical transposed-lhs form
        ys = []
        for i in range(rows):
            ys.append(
                jax.lax.dot_general(
                    s_mat[:, i, :],
                    w_ref[:],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        acc = jnp.stack(ys, axis=0)  # (R, W2, CO)
    else:
        acc = jax.lax.dot_general(
            s_mat,
            w_ref[:],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, W2, CO)
    yb = acc.astype(y_ref.dtype)
    y_ref[0] = yb
    yf = yb.astype(jnp.float32)
    su = jnp.sum(yf, axis=(0, 1))[None]
    sq = jnp.sum(yf * yf, axis=(0, 1))[None]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        ssq_ref[:] = jnp.zeros_like(ssq_ref)

    sum_ref[:] += su
    ssq_ref[:] += sq


def stem_conv_stats(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    interpret: bool = False,
    rows_per_tile: Optional[int] = None,
    unroll_m: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """7x7/s2/p3 conv + per-channel batch-stat sums of its bf16 output.

    Returns ``(y, sum, sumsq)``: y is (B, H/2, W/2, CO) in ``x.dtype``;
    sum/sumsq are (CO,) f32 sums over all B*H/2*W/2 positions of the
    rounded conv output (what BatchNorm's batch stats reduce over).
    """
    b, h, wdt, c = x.shape
    assert supported(x.shape, w.shape), (x.shape, w.shape)
    h2, w2 = h // 2, wdt // 2
    co = w.shape[-1]
    rows = rows_per_tile or int(os.environ.get("SIHL_TPU_STEM_ROWS", "0")) or _pick_rows(h2)
    if h2 % rows:
        rows = _pick_rows(h2)
    chunk = 2 * c
    lanes = w2 + 3  # chunk columns, incl. the 3-chunk right halo

    # row-flat view, padded so patches index without masks, then split by
    # row parity and lane phase (module doc) — one fused XLA HBM pass
    flat = x.reshape(b, h, wdt * c)
    hp = 2 * h2 + 2 * rows
    xp = jnp.pad(flat, ((0, 0), (4, hp - 4 - h), (3 * c, 3 * c)))
    xr = xp.reshape(b, hp // 2, 2, lanes, chunk)  # row = 2m + parity
    xt = xr.transpose(0, 2, 4, 1, 3)  # (B, 2, chunk, HP/2, lanes)
    wk = _remap_kernel(w.astype(x.dtype))

    grid = (b, h2 // rows)
    kernel = functools.partial(
        _stem_kernel, rows=rows, w2=w2, c=c, unroll_m=unroll_m
    )
    block = (1, 1, chunk, rows, lanes)
    y, s, q = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda i, j: (i, 0, 0, j, 0)),
            pl.BlockSpec(block, lambda i, j: (i, 0, 0, j + 1, 0)),
            pl.BlockSpec(block, lambda i, j: (i, 1, 0, j, 0)),
            pl.BlockSpec(block, lambda i, j: (i, 1, 0, j + 1, 0)),
            pl.BlockSpec(wk.shape, lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, w2, co), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
            pl.BlockSpec((1, co), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h2, w2, co), x.dtype),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ],
        interpret=interpret,
    )(xt, xt, xt, xt, wk)
    return y, s[0], q[0]

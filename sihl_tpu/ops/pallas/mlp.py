"""Fused dense-MLP Pallas kernel for the detection-family heads.

The reference's per-anchor heads are torchvision ``ops.MLP``s — four
Linear→LayerNorm→SiLU hidden layers plus a bare output Linear — applied
densely over every anchor of every level (reference
``src/sihl/heads/object_detection.py:57-61,99-122``).  On TPU these are
tall-skinny matmuls (M ≈ 10^5 rows, K = N = 256): XLA materializes every
hidden activation in HBM (~70 MB per layer per MLP), so the op chain runs
at HBM bandwidth, ~3x slower than the MXU could go.

This kernel keeps the whole MLP stack in VMEM: the weights of *all* MLPs
sharing one input live on-chip (~1 MB), each grid step streams one row
tile of the input, runs every layer of every MLP back-to-back on the MXU,
and writes only the (tiny) outputs.  The custom VJP recomputes the hidden
states per tile in the backward kernel (flash-attention-style), emitting
dx plus f32 parameter-gradient accumulators — no hidden state ever
round-trips through HBM in either direction.

Semantics match :class:`sihl_tpu.layers.mlp.MLP`: bf16 matmuls with f32
MXU accumulation, LayerNorm statistics in f32, SiLU on the normalized
output, final layer a bare Linear.  Parity is tested against the module
chain in interpreter mode on CPU and on real TPU.
"""

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_LN_EPS = 1e-5

# A/B switch for the in-kernel f32 sigmoid (the step's VPU bottleneck:
# ~280M evaluations/step).  Candidates measured on chip; see STATUS.md.
_SIGMOID_MODE = os.environ.get("SIHL_TPU_MLP_SIGMOID", "exp")


def _sigmoid_f32(zf):
    if _SIGMOID_MODE == "exp2":
        # one fewer internal range-reduction multiply if Mosaic lowers
        # exp via exp2 anyway
        return 1.0 / (1.0 + jnp.exp2(zf * -1.4426950408889634))
    if _SIGMOID_MODE == "tanh":
        return 0.5 * (jnp.tanh(zf * 0.5) + 1.0)
    return jax.nn.sigmoid(zf)


# VPU-lean layer math (the kernel is VPU-bound, not matmul-bound: the
# bias-only probe floor is 1.01 ms vs 1.81 ms with LN+SiLU —
# tools/probe_mlp_pipeline.py).  Two rewrites, both value-preserving up to
# f32 reassociation:
#   * LN statistics in ONE data pass: var = E[y^2] - E[y]^2 (flax
#     BatchNorm's "fast variance") instead of a second (y-mu)^2 pass;
#   * the normalize+affine chain folded to two FMA-shaped passes:
#     z = (y*r)*sc + (bi - (mu*r)*sc).
# The backward kernel additionally stashes the recomputed sigmoid in bf16
# so the backward sweep does not re-evaluate the transcendental (the
# single most expensive VPU op in the kernel).
_VPU_LEAN = os.environ.get("SIHL_TPU_MLP_VPU_LEAN", "0") == "1"
# A/B on the flagship bench (2026-08-19, clean canaries): lean
# 235.6/232.2 vs base 237.1/237.2 img/s — a measured LOSS despite the
# lower VPU op count (Mosaic's schedule of the two-pass LN overlaps
# better than the "cheaper" fused form).  Default OFF; kept as an opt-in
# probe lever.


def _ln_affine(y, sc_f32, bi_f32, want_n=False):
    """(z_f32, n_f32 | None, rstd) for LayerNorm(y)*sc+bi over the last axis."""
    if _VPU_LEAN:
        mu = y.mean(axis=-1, keepdims=True)
        musq = (y * y).mean(axis=-1, keepdims=True)
        var = jnp.maximum(musq - mu * mu, 0.0)
        rstd = jax.lax.rsqrt(var + _LN_EPS)
        mr = mu * rstd  # (rows, 1) — cheap
        t = y * rstd  # one broadcast mul
        n = (t - mr) if want_n else None
        z = t * sc_f32 + (bi_f32 - mr * sc_f32)
        return z, n, rstd
    mu = y.mean(axis=-1, keepdims=True)
    var = ((y - mu) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    n = (y - mu) * rstd
    z = n * sc_f32 + bi_f32
    return z, (n if want_n else None), rstd


# -- pure-JAX reference (fallback + parity oracle) ---------------------------


def mlp_reference(x, wh, bh, sc, bi, wo, bo, compute_dtype=jnp.bfloat16):
    """One MLP: hidden stack (L,D,D)/(L,D) + LN params, then out Linear."""
    h = x.astype(compute_dtype)
    num_layers = wh.shape[0]
    for l in range(num_layers):
        y = h @ wh[l].astype(compute_dtype) + bh[l].astype(compute_dtype)
        yf = y.astype(jnp.float32)
        mu = yf.mean(axis=-1, keepdims=True)
        var = ((yf - mu) ** 2).mean(axis=-1, keepdims=True)
        n = (yf - mu) * jax.lax.rsqrt(var + _LN_EPS)
        z = (n * sc[l].astype(jnp.float32) + bi[l].astype(jnp.float32)).astype(
            compute_dtype
        )
        h = z * jax.nn.sigmoid(z)
    return h @ wo.astype(compute_dtype) + bo.astype(compute_dtype)


# -- forward kernel -----------------------------------------------------------


def _fwd_kernel(x_ref, *refs, num_heads, num_layers):
    # refs: per head (wh, bh, sc, bi, wo, bo), then per head out_ref
    h0 = x_ref[:]
    for head in range(num_heads):
        wh, bh, sc, bi, wo, bo = refs[head * 6 : head * 6 + 6]
        out_ref = refs[num_heads * 6 + head]
        h = h0
        for l in range(num_layers):
            y = jnp.dot(
                h, wh[l], preferred_element_type=jnp.float32
            ) + bh[l].astype(jnp.float32)
            zf32, _, _ = _ln_affine(
                y, sc[l].astype(jnp.float32), bi[l].astype(jnp.float32)
            )
            z = zf32.astype(h0.dtype)
            # silu in f32: Mosaic rejects bf16 logistic (vector.broadcast
            # element-type mismatch).  "bf16" mode routes through tanh in
            # bf16 instead — half the VPU elementwise volume if supported.
            if _SIGMOID_MODE == "bf16":
                h = z * (jnp.tanh(z * 0.5) * 0.5 + 0.5)
            else:
                zf = z.astype(jnp.float32)
                h = (zf * _sigmoid_f32(zf)).astype(h0.dtype)
        out = jnp.dot(h, wo[:], preferred_element_type=jnp.float32) + bo[
            0
        ].astype(jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)


# On-chip A/B 2026-08-18 (flagship bench, img/s): tile512/f32-ns 219.5,
# tile1024+bf16-ns 221.0, tile2048+bf16-ns needs scoped-vmem 32M which
# regresses the convs globally (210.8); tile880/f32-ns OOMs the 16M scoped
# vmem.  2026-08-19: with SIHL_TPU_ANCHOR_PAD=256 the row count becomes
# 2^13-divisible, a 1024-row bwd tile overflows the 16M scoped vmem by
# 2.4M (and buying it back with SIHL_TPU_MLP_VMEM_MB=24 measured 183 —
# a big loss), so the default cap is 512: pad+tile512 measured
# 237.0/237.1 vs 235.6 img/s for unpadded+tile880.
# The bwd tile cap is coupled to SIHL_TPU_ANCHOR_PAD (heads/anchors.py):
# with the anchor axis padded to 256 the row counts are 2^13-divisible and
# a 1024-row tile overflows the 16M scoped vmem, so the default is 512;
# with padding off the row counts only divide 880 and the measured-best
# tile is 1024 (cap admits 880).  A user-set combination of ANCHOR_PAD=256
# with BWD_TILE>=1024 is the documented scoped-VMEM-overflow pair.
_BWD_TILE_CAP = int(
    os.environ.get("SIHL_TPU_MLP_BWD_TILE")
    or ("512" if int(os.environ.get("SIHL_TPU_ANCHOR_PAD", "256") or "0") else "1024")
)
_FWD_TILE_CAP = int(os.environ.get("SIHL_TPU_MLP_FWD_TILE", "2480"))
# stash the recomputed LN outputs in bf16 in the backward kernel: ~2 MB
# less VMEM per 880-row tile (enables bigger tiles), ~1e-3 relative noise
# on dsc/dy grad terms (accumulation stays f32)
_NS_BF16 = os.environ.get("SIHL_TPU_MLP_NS_BF16", "1") == "1"
# Per-KERNEL VMEM budget (MB) via pltpu.CompilerParams(vmem_limit_bytes=):
# unlike the global xla_tpu_scoped_vmem_limit_kib knob (which regressed the
# convs when raised program-wide — STATUS.md), this applies to the fused-MLP
# custom calls only, so wider bwd tiles can be bought without touching XLA's
# budget for the rest of the program.  0 = leave Mosaic's default.
_VMEM_MB = int(os.environ.get("SIHL_TPU_MLP_VMEM_MB", "0") or "0")


def _compiler_params():
    if _VMEM_MB and _HAS_PLTPU:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_MB << 20)
    return None


def _pick_tile(m: int, cap: int = None) -> int:
    """Largest convenient row tile dividing m (0 if none).  The backward
    kernel holds ~5 tile-sized activation stashes in VMEM so its cap
    defaults to 512 (A/B-tunable via SIHL_TPU_MLP_BWD_TILE); the forward
    only streams one hidden buffer and can go wider."""
    if cap is None:
        cap = _BWD_TILE_CAP
    for tile in (4960, 4096, 3200, 2480, 2048, 1600, 1024, 880, 512, 496, 400, 256, 176, 128, 80, 64, 32, 16):
        if tile <= cap and m % tile == 0:
            return tile
    return 0


def _pad_rows(m: int) -> int:
    """Rows after padding to the next multiple of 256."""
    return -(-m // 256) * 256


def _fwd_pallas(x, heads, interpret: bool):
    m, d = x.shape
    tile = _pick_tile(m, cap=_FWD_TILE_CAP)
    num_heads = len(heads)
    num_layers = heads[0][0].shape[0]
    grid = (m // tile,)

    def row_spec(width, dtype_unused=None):
        return pl.BlockSpec((tile, width), lambda i: (i, 0))

    in_specs = [row_spec(d)]
    args = [x]
    for (wh, bh, sc, bi, wo, bo) in heads:
        in_specs += [
            pl.BlockSpec(wh.shape, lambda i: (0,) * 3),
            pl.BlockSpec(bh.shape, lambda i: (0, 0)),
            pl.BlockSpec(sc.shape, lambda i: (0, 0)),
            pl.BlockSpec(bi.shape, lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo.shape, lambda i: (0, 0)),
        ]
        args += [wh, bh, sc, bi, wo, bo]
    out_shapes = [
        jax.ShapeDtypeStruct((m, wo.shape[1]), x.dtype) for (_, _, _, _, wo, _) in heads
    ]
    out_specs = [row_spec(wo.shape[1]) for (_, _, _, _, wo, _) in heads]

    kernel = functools.partial(
        _fwd_kernel, num_heads=num_heads, num_layers=num_layers
    )
    flops = sum(
        2 * m * d * (num_layers * d + wo.shape[1]) for (_, _, _, _, wo, _) in heads
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=m * d * num_layers * num_heads,
        ),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*args)


# -- backward kernel ----------------------------------------------------------


def _bwd_kernel(x_ref, *refs, num_heads, num_layers):
    """Recompute hiddens for this row tile, backprop, accumulate param grads.

    refs layout: per head (wh, bh, sc, bi, wo, bo, g);
    outputs: dx, then per head (dwh, dbh, dsc, dbi, dwo, dbo).
    """
    first_out = num_heads * 7
    dx_ref = refs[first_out]
    i = pl.program_id(0)

    x = x_ref[:]
    dx = jnp.zeros(x.shape, jnp.float32)
    for head in range(num_heads):
        wh, bh, sc, bi, wo, bo, g_ref = refs[head * 7 : head * 7 + 7]
        dwh_ref, dbh_ref, dsc_ref, dbi_ref, dwo_ref, dbo_ref = refs[
            first_out + 1 + head * 6 : first_out + 1 + head * 6 + 6
        ]

        # forward recompute, stashing per-layer tensors (python list = VMEM)
        hs, ns, zs, rstds, sigs = [], [], [], [], []
        h = x
        for l in range(num_layers):
            hs.append(h)
            y = jnp.dot(
                h, wh[l], preferred_element_type=jnp.float32
            ) + bh[l].astype(jnp.float32)
            zf32, n, rstd = _ln_affine(
                y, sc[l].astype(jnp.float32), bi[l].astype(jnp.float32), want_n=True
            )
            z = zf32.astype(x.dtype)
            ns.append(n.astype(jnp.bfloat16) if _NS_BF16 else n)
            zs.append(z)
            rstds.append(rstd)
            if _SIGMOID_MODE == "bf16":
                sig = jnp.tanh(z * 0.5) * 0.5 + 0.5
                h = z * sig
            else:
                zf = z.astype(jnp.float32)
                sig = _sigmoid_f32(zf)
                h = (zf * sig).astype(x.dtype)
            if _VPU_LEAN:
                # stash the sigmoid (bf16) so the backward sweep below does
                # not pay the transcendental a second time; ~1e-3 relative
                # noise on dz, same scale as the bf16 n stash
                sigs.append(sig.astype(jnp.bfloat16))

        g = g_ref[:].astype(jnp.float32)
        # output layer
        dwo = jax.lax.dot_general(
            h.astype(jnp.float32),
            g,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbo = jnp.sum(g, axis=0, keepdims=True)
        dh = jnp.dot(
            g.astype(x.dtype), wo[:].T, preferred_element_type=jnp.float32
        )

        @pl.when(i == 0)
        def _():
            dwo_ref[:] = jnp.zeros_like(dwo_ref)
            dbo_ref[:] = jnp.zeros_like(dbo_ref)

        dwo_ref[:] += dwo
        dbo_ref[:] += dbo

        for l in range(num_layers - 1, -1, -1):
            zf = zs[l].astype(jnp.float32)
            if _VPU_LEAN:
                sig = sigs[l].astype(jnp.float32)
            elif _SIGMOID_MODE == "bf16":
                sig = (jnp.tanh(zs[l] * 0.5) * 0.5 + 0.5).astype(jnp.float32)
            else:
                sig = _sigmoid_f32(zf)
            dz = dh * (sig * (1.0 + zf * (1.0 - sig)))
            dsc = jnp.sum(dz * ns[l], axis=0, keepdims=True)
            dbi = jnp.sum(dz, axis=0, keepdims=True)
            dn = dz * sc[l].astype(jnp.float32)
            # LayerNorm backward over the feature axis
            mean_dn = dn.mean(axis=-1, keepdims=True)
            mean_dn_n = (dn * ns[l]).mean(axis=-1, keepdims=True)
            dy = rstds[l] * (dn - mean_dn - ns[l] * mean_dn_n)
            dbh = jnp.sum(dy, axis=0, keepdims=True)
            dwh = jax.lax.dot_general(
                hs[l].astype(jnp.float32),
                dy,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh = jnp.dot(
                dy.astype(x.dtype), wh[l].T, preferred_element_type=jnp.float32
            )

            @pl.when(i == 0)
            def _():
                dwh_ref[l] = jnp.zeros_like(dwh_ref[l])
                dbh_ref[l] = jnp.zeros_like(dbh_ref[l])
                dsc_ref[l] = jnp.zeros_like(dsc_ref[l])
                dbi_ref[l] = jnp.zeros_like(dbi_ref[l])

            dwh_ref[l] += dwh
            dbh_ref[l] += dbh[0]
            dsc_ref[l] += dsc[0]
            dbi_ref[l] += dbi[0]
        dx += dh
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _bwd_pallas(x, heads, gs, interpret: bool):
    m, d = x.shape
    tile = _pick_tile(m)
    num_heads = len(heads)
    num_layers = heads[0][0].shape[0]
    grid = (m // tile,)

    in_specs = [pl.BlockSpec((tile, d), lambda i: (i, 0))]
    args = [x]
    for (wh, bh, sc, bi, wo, bo), g in zip(heads, gs):
        in_specs += [
            pl.BlockSpec(wh.shape, lambda i: (0,) * 3),
            pl.BlockSpec(bh.shape, lambda i: (0, 0)),
            pl.BlockSpec(sc.shape, lambda i: (0, 0)),
            pl.BlockSpec(bi.shape, lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo.shape, lambda i: (0, 0)),
            pl.BlockSpec((tile, g.shape[1]), lambda i: (i, 0)),
        ]
        args += [wh, bh, sc, bi, wo, bo, g]

    out_shapes = [jax.ShapeDtypeStruct((m, d), x.dtype)]
    out_specs = [pl.BlockSpec((tile, d), lambda i: (i, 0))]
    for (wh, bh, sc, bi, wo, bo) in heads:
        out_shapes += [
            jax.ShapeDtypeStruct(wh.shape, jnp.float32),
            jax.ShapeDtypeStruct(bh.shape, jnp.float32),
            jax.ShapeDtypeStruct(sc.shape, jnp.float32),
            jax.ShapeDtypeStruct(bi.shape, jnp.float32),
            jax.ShapeDtypeStruct(wo.shape, jnp.float32),
            jax.ShapeDtypeStruct(bo.shape, jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec(wh.shape, lambda i: (0,) * 3),
            pl.BlockSpec(bh.shape, lambda i: (0, 0)),
            pl.BlockSpec(sc.shape, lambda i: (0, 0)),
            pl.BlockSpec(bi.shape, lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo.shape, lambda i: (0, 0)),
        ]

    kernel = functools.partial(
        _bwd_kernel, num_heads=num_heads, num_layers=num_layers
    )
    flops = sum(
        6 * m * d * (num_layers * d + wo.shape[1]) for (_, _, _, _, wo, _) in heads
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 3,
            transcendentals=2 * m * d * num_layers * num_heads,
        ),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(*args)


# -- custom-VJP op ------------------------------------------------------------


def _flatten_heads(heads):
    flat = []
    for h in heads:
        flat.extend(h)
    return flat


def _unflatten_heads(flat, num_heads):
    return [tuple(flat[i * 6 : i * 6 + 6]) for i in range(num_heads)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_mlps(num_heads, interpret, x, *flat_params):
    heads = _unflatten_heads(flat_params, num_heads)
    outs = _fwd_pallas(x, heads, interpret)
    return tuple(outs)


def _fused_fwd(num_heads, interpret, x, *flat_params):
    outs = _fused_mlps(num_heads, interpret, x, *flat_params)
    return outs, (x, flat_params)


def _fused_bwd(num_heads, interpret, res, gs):
    x, flat_params = res
    heads = _unflatten_heads(flat_params, num_heads)
    gs = [g.astype(x.dtype) for g in gs]
    outs = _bwd_pallas(x, heads, gs, interpret)
    dx = outs[0]
    dparams = outs[1:]
    # cast param grads back to the params' dtypes
    dparams = tuple(
        dp.astype(p.dtype) for dp, p in zip(dparams, flat_params)
    )
    return (dx,) + dparams


_fused_mlps.defvjp(_fused_fwd, _fused_bwd)


# -- public API ---------------------------------------------------------------


def pack_mlp_params(mlp, compute_dtype=jnp.bfloat16):
    """Stack an :class:`sihl_tpu.layers.mlp.MLP`'s parameters into the
    (wh, bh, sc, bi, wo, bo) tuple the kernel consumes."""
    linears = list(mlp.linears)
    norms = list(mlp.norms)
    wh = jnp.stack([l.kernel[...] for l in linears[:-1]]).astype(compute_dtype)
    bh = jnp.stack([l.bias[...] for l in linears[:-1]]).astype(jnp.float32)
    sc = jnp.stack([n.scale[...] for n in norms]).astype(jnp.float32)
    bi = jnp.stack([n.bias[...] for n in norms]).astype(jnp.float32)
    wo = linears[-1].kernel[...].astype(compute_dtype)
    bo = linears[-1].bias[...].astype(jnp.float32)[None, :]
    return (wh, bh, sc, bi, wo, bo)


def supported(x_2d, mlps) -> bool:
    """Kernel restrictions: uniform hidden width equal to the input width,
    >= 1 hidden layer, feature dim lane-aligned."""
    if not _HAS_PLTPU:
        return False
    m, d = x_2d.shape
    if d % 128 != 0:
        return False
    depths = set()
    for mlp in mlps:
        linears = list(mlp.linears)
        if len(linears) < 2 or len(mlp.norms) != len(linears) - 1:
            return False
        depths.add(len(linears))
        for l in linears[:-1]:
            if l.kernel[...].shape != (d, d):
                return False
    # the kernels index every head's stacked hidden weights with head 0's
    # layer count — mixed depths would truncate or over-read
    return len(depths) == 1


def fused_mlps(x_2d, mlps, interpret: bool = False):
    """Run several MLPs over one shared (M, D) input in a single fused
    kernel pass; returns one (M, out_i) array per MLP.

    Non-tileable row counts are zero-padded (zero rows are LN-safe and
    contribute zero parameter gradient because their cotangents are zero).
    """
    m = x_2d.shape[0]
    m_run = m if _pick_tile(m) else _pad_rows(m)
    if m_run != m:
        x_run = jnp.zeros((m_run, x_2d.shape[1]), x_2d.dtype).at[:m].set(x_2d)
    else:
        x_run = x_2d
    heads = [pack_mlp_params(mlp, x_2d.dtype) for mlp in mlps]
    outs = _fused_mlps(len(heads), interpret, x_run, *_flatten_heads(heads))
    return [o[:m] for o in outs]

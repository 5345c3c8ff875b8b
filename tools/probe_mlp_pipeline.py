"""A/B probe: fused-MLP forward-kernel restructurings on the real chip.

The flagship step spends ~6.6 ms in the fused loc/iou MLP pass
(ROOFLINE.md: 86 TF/s effective vs 192 peak).  Hypothesis: the per-tile
MXU->VPU(LN+SiLU)->MXU dependency chain serializes, so the kernel runs at
matmul+VPU time, not max(matmul, VPU).  Variants measured here:

  base      — the shipped kernel (ops/pallas/mlp.py _fwd_kernel)
  nops      — LN+SiLU replaced by bias-only (measures the pure-matmul
              floor; parity-breaking, probe only)
  mxured    — LN lane-reductions (mean, mean-of-squares) via y @ ones
              matmuls instead of VPU cross-lane reduces
  pingpong  — row tile split in halves, half-B's matmul issued while
              half-A's LN/SiLU runs on the VPU
  pp+mxured — both

Timing: two-point amortized fori_loop (cancels the ~40 ms tunnel RTT),
min of 3 — the method from tools/roofline_table.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mlp_pipeline.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, D, L = 136400 // 16 * 16, 256, 4  # flagship loc/iou shape (136400 rows)
HEADS = 2  # loc + iou, both out=1
TILE = 2480
_LN_EPS = 1e-5


def make_params(rng):
    heads = []
    for _ in range(HEADS):
        wh = jnp.asarray(rng.randn(L, D, D) * 0.05, jnp.bfloat16)
        bh = jnp.asarray(rng.randn(L, D) * 0.05, jnp.float32)
        sc = jnp.asarray(1.0 + rng.randn(L, D) * 0.05, jnp.float32)
        bi = jnp.asarray(rng.randn(L, D) * 0.05, jnp.float32)
        wo = jnp.asarray(rng.randn(D, 1) * 0.05, jnp.bfloat16)
        bo = jnp.asarray(rng.randn(1, 1) * 0.05, jnp.float32)
        heads.append((wh, bh, sc, bi, wo, bo))
    return heads


def _ln_silu(y, sc, bi, dtype):
    mu = y.mean(axis=-1, keepdims=True)
    var = ((y - mu) ** 2).mean(axis=-1, keepdims=True)
    n = (y - mu) * jax.lax.rsqrt(var + _LN_EPS)
    z = (n * sc.astype(jnp.float32) + bi.astype(jnp.float32)).astype(dtype)
    zf = z.astype(jnp.float32)
    return (zf * jax.nn.sigmoid(zf)).astype(dtype)


def _ln_silu_mxu(y, sc, bi, ones_col, dtype):
    # lane reductions as (tile,256)@(256,1) matmuls
    mu = jnp.dot(y, ones_col, preferred_element_type=jnp.float32) * (1.0 / D)
    musq = jnp.dot(y * y, ones_col, preferred_element_type=jnp.float32) * (1.0 / D)
    var = musq - mu * mu
    n = (y - mu) * jax.lax.rsqrt(var + _LN_EPS)
    z = (n * sc.astype(jnp.float32) + bi.astype(jnp.float32)).astype(dtype)
    zf = z.astype(jnp.float32)
    return (zf * jax.nn.sigmoid(zf)).astype(dtype)


def kernel_base(x_ref, *refs, mode):
    h0 = x_ref[:]
    ones_col = jnp.ones((D, 1), jnp.float32) if "mxured" in mode else None
    for head in range(HEADS):
        wh, bh, sc, bi, wo, bo = refs[head * 6 : head * 6 + 6]
        out_ref = refs[HEADS * 6 + head]
        if "pingpong" in mode:
            half = h0.shape[0] // 2
            ha, hb = h0[:half], h0[half:]
            ya = jnp.dot(ha, wh[0], preferred_element_type=jnp.float32) + bh[0].astype(jnp.float32)
            yb = jnp.dot(hb, wh[0], preferred_element_type=jnp.float32) + bh[0].astype(jnp.float32)
            for l in range(L):
                # VPU on a overlaps the already-issued matmul for b
                if "mxured" in mode:
                    za = _ln_silu_mxu(ya, sc[l], bi[l], ones_col, h0.dtype)
                else:
                    za = _ln_silu(ya, sc[l], bi[l], h0.dtype)
                if l + 1 < L:
                    ya = jnp.dot(za, wh[l + 1], preferred_element_type=jnp.float32) + bh[l + 1].astype(jnp.float32)
                else:
                    oa = jnp.dot(za, wo[:], preferred_element_type=jnp.float32) + bo[0].astype(jnp.float32)
                if "mxured" in mode:
                    zb = _ln_silu_mxu(yb, sc[l], bi[l], ones_col, h0.dtype)
                else:
                    zb = _ln_silu(yb, sc[l], bi[l], h0.dtype)
                if l + 1 < L:
                    yb = jnp.dot(zb, wh[l + 1], preferred_element_type=jnp.float32) + bh[l + 1].astype(jnp.float32)
                else:
                    ob = jnp.dot(zb, wo[:], preferred_element_type=jnp.float32) + bo[0].astype(jnp.float32)
            out_ref[:] = jnp.concatenate([oa, ob], axis=0).astype(out_ref.dtype)
        else:
            h = h0
            for l in range(L):
                y = jnp.dot(h, wh[l], preferred_element_type=jnp.float32) + bh[l].astype(jnp.float32)
                if mode == "nops":
                    h = y.astype(h0.dtype)
                elif "mxured" in mode:
                    h = _ln_silu_mxu(y, sc[l], bi[l], ones_col, h0.dtype)
                else:
                    h = _ln_silu(y, sc[l], bi[l], h0.dtype)
            out = jnp.dot(h, wo[:], preferred_element_type=jnp.float32) + bo[0].astype(jnp.float32)
            out_ref[:] = out.astype(out_ref.dtype)


def build(mode, heads):
    grid = (M // TILE,)
    in_specs = [pl.BlockSpec((TILE, D), lambda i: (i, 0))]
    for (wh, bh, sc, bi, wo, bo) in heads:
        in_specs += [
            pl.BlockSpec(wh.shape, lambda i: (0,) * 3),
            pl.BlockSpec(bh.shape, lambda i: (0, 0)),
            pl.BlockSpec(sc.shape, lambda i: (0, 0)),
            pl.BlockSpec(bi.shape, lambda i: (0, 0)),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo.shape, lambda i: (0, 0)),
        ]
    out_shapes = [jax.ShapeDtypeStruct((M, 1), jnp.bfloat16) for _ in heads]
    out_specs = [pl.BlockSpec((TILE, 1), lambda i: (i, 0)) for _ in heads]
    kern = functools.partial(kernel_base, mode=mode)
    flops = HEADS * 2 * M * D * (L * D + 1)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=M * D * 2 * 2, transcendentals=M * D * L * HEADS
        ),
    )


def amortized(fn, x, est_iter_s):
    def body(_, c):
        outs = fn(c)
        bump = sum(o.sum() for o in outs).astype(c.dtype) * 1e-20
        return c + bump

    n1 = max(2, int(0.1 / est_iter_s))
    n2 = n1 + max(8, int(0.4 / est_iter_s))
    times = []
    for n in (n1, n2):
        f = jax.jit(lambda x0, n=n: jax.lax.fori_loop(0, n, body, x0).sum())
        float(f(x))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            samples.append(time.perf_counter() - t0)
        times.append(min(samples))
    return max(times[1] - times[0], 1e-12) / (n2 - n1)


def main():
    rng = np.random.RandomState(0)
    heads = make_params(rng)
    x = jnp.asarray(rng.randn(M, D) * 0.5, jnp.bfloat16)
    flops = HEADS * 2 * M * D * (L * D + 1)

    base_out = None
    for mode in ("base", "nops", "mxured", "pingpong", "pp+mxured"):
        call = build(mode, heads)
        fn = lambda c: call(c, *[p for h in heads for p in h])
        outs = fn(x)
        if mode == "base":
            base_out = [np.asarray(o, np.float32) for o in outs]
        elif mode != "nops":
            for o, ref in zip(outs, base_out):
                err = float(np.max(np.abs(np.asarray(o, np.float32) - ref)))
                assert err < 2e-2, (mode, err)
        dt = amortized(fn, x, est_iter_s=flops / 80e12)
        print(
            f"{mode:10s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s",
            flush=True,
        )


if __name__ == "__main__":
    main()

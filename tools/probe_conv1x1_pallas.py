"""Prove-or-break probe for the low-channel 1x1-conv "ceiling" (round-3
verdict weak #2): is XLA's 47 TF/s on the 1x1 64->256 @160^2 shape an XLA
artifact, or the hardware limit for that shape?

Four legs, all the flagship shape (16*160*160 rows, 64 -> 256):

  xla_conv        — lax.conv_general_dilated (the ceiling probe used in
                    tools/roofline_table.py)
  xla_conv_stats  — the same conv with fused sum/sum-of-squares epilogue
                    (what the real program runs: every conv feeds a
                    BatchNorm, and the drill shows those fusions at
                    0.48-1.45 ms vs 0.29 ms standalone)
  pallas_mm       — shape-matched Pallas matmul (64-lane contraction)
  pallas_mm_stats — Pallas matmul + in-kernel f32 stat accumulators

Arithmetic for the verdict: the op reads 52 MB and writes 210 MB, so the
HBM floor at the measured 826 GB/s stream ceiling is ~0.32 ms = 42 TF/s
effective.  Anything in the 42-47 TF/s band IS the memory bound — the
MXU's K=64 occupancy (~98 TF/s) never becomes the binding constraint.

Timing: two-point amortized fori_loop (cancels the ~40 ms tunnel RTT).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_conv1x1_pallas.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B, S, CI, CO = 16, 160, 64, 256
M = B * S * S
TILE = 8192
FLOPS = 2 * M * CI * CO
BYTES = M * CI * 2 + M * CO * 2  # bf16 read + write


def amortized(fn, x, est_iter_s):
    def body(_, c):
        outs = fn(c)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
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


def _mm_kernel(x_ref, w_ref, y_ref, *, stats, s1_ref=None, s2_ref=None):
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    if stats:
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            s1_ref[:] = jnp.zeros_like(s1_ref)
            s2_ref[:] = jnp.zeros_like(s2_ref)

        s1_ref[:] += jnp.sum(y, axis=0, keepdims=True)
        s2_ref[:] += jnp.sum(y * y, axis=0, keepdims=True)


def build_pallas(stats: bool):
    grid = (M // TILE,)
    in_specs = [
        pl.BlockSpec((TILE, CI), lambda i: (i, 0)),
        pl.BlockSpec((CI, CO), lambda i: (0, 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((M, CO), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((TILE, CO), lambda i: (i, 0))]
    if stats:
        out_shapes += [jax.ShapeDtypeStruct((1, CO), jnp.float32)] * 2
        out_specs += [pl.BlockSpec((1, CO), lambda i: (0, 0))] * 2
        kern = functools.partial(_mm_kernel, stats=True)

        def kern(x_ref, w_ref, y_ref, s1_ref, s2_ref):
            _mm_kernel(x_ref, w_ref, y_ref, stats=True, s1_ref=s1_ref, s2_ref=s2_ref)

    else:
        def kern(x_ref, w_ref, y_ref):
            _mm_kernel(x_ref, w_ref, y_ref, stats=False)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=FLOPS, bytes_accessed=BYTES, transcendentals=0
        ),
    )


def main():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(CI, CO) * 0.05, jnp.bfloat16)
    w4 = w.reshape(1, 1, CI, CO)
    x_img = jnp.asarray(rng.randn(B, S, S, CI) * 0.5, jnp.bfloat16)
    x_flat = x_img.reshape(M, CI)

    def xla_conv(c):
        y = jax.lax.conv_general_dilated(
            c, w4, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return (y[..., :CI],)

    def xla_conv_stats(c):
        y = jax.lax.conv_general_dilated(
            c, w4, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        yf = y.astype(jnp.float32)
        s1 = jnp.sum(yf, axis=(0, 1, 2))
        s2 = jnp.sum(yf * yf, axis=(0, 1, 2))
        return (y[..., :CI], s1[:CI].astype(jnp.bfloat16), s2[:CI].astype(jnp.bfloat16))

    mm = build_pallas(stats=False)
    mm_stats = build_pallas(stats=True)

    def pallas_mm(c):
        (y,) = mm(c, w)
        return (y[:, :CI],)

    def pallas_mm_stats(c):
        y, s1, s2 = mm_stats(c, w)
        return (y[:, :CI], s1.astype(jnp.bfloat16), s2.astype(jnp.bfloat16))

    legs = [
        ("xla_conv", xla_conv, x_img),
        ("xla_conv_stats", xla_conv_stats, x_img),
        ("pallas_mm", pallas_mm, x_flat),
        ("pallas_mm_stats", pallas_mm_stats, x_flat),
    ]
    # parity spot check (matmul == conv on the same data)
    y_ref = np.asarray(xla_conv(x_img)[0], np.float32).reshape(M, CI)
    y_mm = np.asarray(pallas_mm(x_flat)[0], np.float32)
    err = float(np.max(np.abs(y_ref - y_mm)))
    assert err < 1e-2, err

    print(f"shape: ({M}, {CI}) @ ({CI}, {CO})  flops {FLOPS/1e9:.1f} G  "
          f"hbm floor @826 GB/s = {BYTES/826e9*1e3:.3f} ms "
          f"({FLOPS/(BYTES/826e9)/1e12:.1f} TF/s effective)", flush=True)
    for name, fn, x in legs:
        dt = amortized(fn, x, est_iter_s=FLOPS / 40e12)
        print(
            f"{name:16s} {dt*1e3:7.3f} ms  {FLOPS/dt/1e12:6.1f} TF/s  "
            f"{BYTES/dt/1e9:6.0f} GB/s-effective",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Probe: can a Pallas streaming-reduction kernel beat XLA's wrt-filter
backward convs?

The round-4 trace drill shows the 1x1 wrt-filter backward matmuls (e.g.
``fusion.3450``: dw = x^T @ dy for the stage-1 bottleneck 1x1 64->256,
x/dy both (16*160*160, C)) running at ~400 GB/s — half the measured
826 GB/s stream ceiling — for 2.6 ms/step at 160^2 plus ~1.6 ms at 80^2.
These ops read two big tensors and write a tiny filter: a pure streaming
reduction, the best possible Pallas fit (no output DMA to pipeline).

Legs per shape: XLA dot_general (honest baseline — loop-invariance
defeated with an optimization_barrier threaded through the carry) vs a
Pallas accumulator kernel over a row-tile grid, several tile sizes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_wrt_filter.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

SHAPES = [
    # (name, M rows, Ci, Co)
    ("160sq_64_256", 16 * 160 * 160, 64, 256),
    ("80sq_128_512", 16 * 80 * 80, 128, 512),
    ("80sq_256_256", 16 * 80 * 80, 256, 256),
]
TILES = [2048, 4096, 8192]


def amortized(fn, args, est_iter_s):
    """Two-point fori_loop timing; carry is the small output so the big
    inputs stay closure constants, with an optimization_barrier keeping
    the kernel call loop-dependent (not hoistable)."""

    def body(_, c):
        xb, dyb, cb = jax.lax.optimization_barrier((args[0], args[1], c))
        return fn(xb, dyb) + cb * 1e-20

    c0 = jnp.zeros(fn(*args).shape, jnp.float32)
    n1 = max(2, int(0.1 / est_iter_s))
    n2 = n1 + max(8, int(0.4 / est_iter_s))
    times = []
    for n in (n1, n2):
        f = jax.jit(lambda c, n=n: jax.lax.fori_loop(0, n, body, c).sum())
        float(f(c0))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(c0))
            samples.append(time.perf_counter() - t0)
        times.append(min(samples))
    return max(times[1] - times[0], 1e-12) / (n2 - n1)


def xla_dot(x, dy):
    return jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _acc_kernel(x_ref, dy_ref, dw_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw_ref[:] += jax.lax.dot_general(
        x_ref[:], dy_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.lru_cache(maxsize=None)
def build_pallas(m, ci, co, tile):
    flops = 2 * m * ci * co
    bytes_ = m * (ci + co) * 2
    return pl.pallas_call(
        _acc_kernel,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, ci), lambda i: (i, 0)),
            pl.BlockSpec((tile, co), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((ci, co), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((ci, co), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_, transcendentals=0
        ),
    )


def main():
    rng = np.random.RandomState(0)
    for name, m, ci, co in SHAPES:
        x = jnp.asarray(rng.randn(m, ci) * 0.1, jnp.bfloat16)
        dy = jnp.asarray(rng.randn(m, co) * 0.1, jnp.bfloat16)
        flops = 2 * m * ci * co
        bytes_ = m * (ci + co) * 2
        floor_ms = bytes_ / 826e9 * 1e3
        print(
            f"-- {name}: ({m},{ci})^T @ ({m},{co}) "
            f"reads {bytes_/1e6:.0f} MB, floor {floor_ms:.3f} ms", flush=True
        )
        ref = np.asarray(xla_dot(x, dy))
        legs = [("xla_dot", xla_dot)]
        for t in TILES:
            if m % t == 0:
                legs.append((f"pallas_t{t}", build_pallas(m, ci, co, t)))
        for lname, fn in legs:
            got = np.asarray(fn(x, dy))
            err = float(np.max(np.abs(got - ref))) / (float(np.max(np.abs(ref))) + 1e-9)
            dt = amortized(fn, (x, dy), est_iter_s=floor_ms / 1e3 * 2)
            print(
                f"  {lname:12s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s  "
                f"{bytes_/dt/1e9:6.0f} GB/s  rel-err {err:.1e}", flush=True
            )


if __name__ == "__main__":
    main()

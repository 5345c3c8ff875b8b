"""Prove-or-break probe for the 3x3 64-channel conv "ceiling" (round-3
verdict weak #2): XLA runs the @160^2 64ch 3x3s at 59 TF/s (ROOFLINE.md).
The op is NOT memory-bound (353 GB/s observed, ~104 MB of traffic) and the
MXU bound for an N=64 output is ~50% of peak = ~98 TF/s — so up to 1.6x
may sit between XLA's kernel and the hardware.

Outcome (2026-08-20, on chip): the two K=192 deep-contraction patch
builds this probe originally targeted are BOTH unlowerable by the
on-chip Mosaic compiler (details in the kernel docstring), so the
shipped kernel is the 9-tap K=64 accumulation — the only formulation
that compiles — which brackets the question from below (K=64/N=64 caps
the MXU at ~25% of peak).  Measured: XLA conv 0.420 ms / 71.9 TF/s vs
Pallas 9-tap 1.094 ms / 27.6 TF/s — the XLA kernel remains best-known
for this shape, and a deeper-contraction Pallas kernel is not
expressible for C=64.

The probe feeds pre-haloed tiles (BlockSpec blocks cannot overlap), so it
measures the compute path; a production kernel would DMA halos.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_conv3x3_pallas.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B, S, C = 16, 160, 64
ROWS = 16  # output rows per grid step
FLOPS = 2 * B * S * S * C * C * 9
BYTES = 2 * B * S * S * C * 2  # bf16 in + out


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


def _conv_kernel(x_ref, w_ref, y_ref):
    """x block: (1, ROWS+2, S+2, C) pre-haloed slab; w: (3, 3, C, C);
    y block: (1, ROWS, S, C).

    9-tap K=64 accumulation — the only formulation Mosaic lowers on this
    chip.  Two deeper-contraction (K=192 patch) builds were attempted and
    REJECTED by the on-chip Mosaic compiler (2026-08-20):
      * flatten (ROWS, S+2, C) -> (ROWS, (S+2)*C) then lane-slice:
        "infer-vector-layout: unsupported shape cast" (sublane-into-lane
        merge);
      * concat three kx-shifted (ROWS, S, C) slices along the lane axis:
        unsupported tpu.concatenate with a misaligned {1,64} lane offset
        (C=64 is half a 128-lane register, so odd-pixel shifts are
        unaligned by construction).
    The K=64/N=64 dot caps the MXU at 25% of peak (~48 TF/s), so this
    variant brackets the question from below: if it lands under XLA's
    59 TF/s, the XLA kernel remains best-known for this shape.
    """
    slab = x_ref[0]  # (ROWS+2, S+2, C)
    acc = jnp.zeros((ROWS * S, C), jnp.float32)
    for ky in range(3):
        rows = slab[ky : ky + ROWS]  # (ROWS, S+2, C)
        for kx in range(3):
            tap = rows[:, kx : kx + S, :].reshape(ROWS * S, C)
            acc += jnp.dot(
                tap, w_ref[ky, kx], preferred_element_type=jnp.float32
            )
    y_ref[0] = acc.reshape(ROWS, S, C).astype(y_ref.dtype)


def build_pallas(n_tiles):
    return pl.pallas_call(
        _conv_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, ROWS + 2, S + 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, ROWS, S, C), lambda i: (i, 0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_tiles, ROWS, S, C), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=FLOPS, bytes_accessed=BYTES, transcendentals=0
        ),
    )


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, S, C) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)

    def xla_conv(c):
        return (
            jax.lax.conv_general_dilated(
                c, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ),
        )

    n_tiles = B * (S // ROWS)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tiles = [xp[:, r * ROWS : r * ROWS + ROWS + 2] for r in range(S // ROWS)]
    x_halo = (
        jnp.stack(tiles, axis=1)
        .reshape(n_tiles, ROWS + 2, S + 2, C)
        .astype(jnp.bfloat16)
    )
    w_taps = w  # (3, 3, C, C): per-tap (C, C) matrices
    call = build_pallas(n_tiles)

    def pallas_rowtap(c):
        return (call(c, w_taps)[0],)

    # parity
    y_ref = np.asarray(xla_conv(x)[0], np.float32)
    y_pl = (
        np.asarray(pallas_rowtap(x_halo)[0], np.float32)
        .reshape(B, S // ROWS, ROWS, S, C)
        .reshape(B, S, S, C)
    )
    err = float(np.max(np.abs(y_ref - y_pl)))
    print("parity max err:", err, flush=True)
    assert err < 1e-1, err

    for name, fn, inp in (
        ("xla_conv", xla_conv, x),
        ("pallas_rowtap", pallas_rowtap, x_halo),
    ):
        dt = amortized(fn, inp, est_iter_s=FLOPS / 50e12)
        print(f"{name:14s} {dt*1e3:7.3f} ms  {FLOPS/dt/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

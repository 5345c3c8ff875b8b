"""Probe: stem forward (7x7/s2/p3 conv + BN-stat sums) formulations.

The in-program stem fusion (`convert_reduce_fusion.187`, ROOFLINE.md
"convs @320^2") runs at 13 TF/s / 104 GB/s — XLA vectorizes the
3-channel conv over BATCH lanes, and batch 16 fills 16/128 of each lane.
Candidate fix: fold H row-groups into the batch axis (with a 6-row halo)
so the lane-occupancy becomes (16*G)/128 — pure XLA, autodiff-safe, no
fusion barrier.

Legs (all include the f32 sum / sum-of-squares stat reduces that XLA
fuses into the in-program stem):
  stock  : direct conv, stride 2, pad 3
  fold8  : batch 16 -> 128 via 8 halo'd row groups
  fold4  : batch 16 -> 64 via 4 halo'd row groups
  s2d    : 2x2 space-to-depth -> 4x4/s1 conv on 12 channels

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_stem_fold.py
"""

import time

import jax
import jax.numpy as jnp

B, H, W, C, CO = 16, 640, 640, 3, 64
DN = ("NHWC", "HWIO", "NHWC")


def amortized(fn, x, est_iter_s):
    """Two-point fori_loop timing (cancels the tunnel RTT)."""

    def body(_, c):
        return (fn(c) * 1e-20).astype(c.dtype) + c

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


def stats(y):
    yf = y.astype(jnp.float32)
    return jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))


def stock(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=DN
    )
    return y, *stats(y)


def make_fold(groups):
    rows = H // 2 // groups  # output rows per group

    def fold(x, w):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        xg = jnp.stack(
            [xp[:, 2 * rows * g : 2 * rows * g + 2 * rows + 6] for g in range(groups)],
            axis=1,
        )  # (B, G, 2*rows+6, W+6, C)
        xg = xg.reshape(B * groups, 2 * rows + 6, W + 6, C)
        y = jax.lax.conv_general_dilated(
            xg, w, (2, 2), ((0, 0), (0, 0)), dimension_numbers=DN
        )  # (B*G, rows, W/2, CO)
        s, q = stats(y)
        return y.reshape(B, H // 2, W // 2, CO), s, q

    return fold


def s2d(x, w):
    x2 = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = (
        wp.reshape(4, 2, 4, 2, C, CO).transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, CO)
    )
    y = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), ((2, 1), (2, 1)), dimension_numbers=DN
    )
    return y, *stats(y)


def main():
    x = jnp.ones((B, H, W, C), jnp.bfloat16)
    w0 = jnp.full((7, 7, C, CO), 0.01, jnp.bfloat16)
    w2_0 = None
    flops = 2 * B * (H // 2) * (W // 2) * 7 * 7 * C * CO
    legs = [
        ("stock", stock, w0),
        ("fold8", make_fold(8), w0),
        ("fold4", make_fold(4), w0),
        ("fold16", make_fold(16), w0),
        ("s2d", s2d, w0),
    ]
    for name, fn, w in legs:
        def run(c, fn=fn, w=w):
            y, s, q = fn(c, w)
            return (s + q).sum()

        try:
            dt = amortized(run, x, est_iter_s=2e-3)
        except Exception as e:  # pragma: no cover
            print(f"{name:8s} FAILED: {type(e).__name__} {str(e)[:120]}")
            continue
        print(
            f"{name:8s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s",
            flush=True,
        )


if __name__ == "__main__":
    main()

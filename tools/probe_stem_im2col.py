"""A/B: 7x7/s2 stem conv as XLA conv vs explicit im2col + dot.

ROOFLINE (r3, fused-BN program): the stem conv+stats fusion runs 2.39
ms/step at 13 TF/s / 104 GB/s — far below both ceilings, because the
3-channel input wastes the 128-wide lanes and XLA's direct conv can't
tile it well.  An explicit patch extraction (640^2x3 -> 320^2x147)
costs one extra HBM round-trip of the patch tensor (~481 MB) but turns
the conv into a well-shaped (1.64M x 147) @ (147 x 64) matmul.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_stem_im2col.py
"""

import json
import time

import numpy as np


def two_point(fn, x, est_iter_s=2.5e-3):
    import jax

    def body(_, c):
        return (fn(c) * 1e-20 + x).astype(x.dtype)

    n1 = max(2, int(0.1 / est_iter_s))
    n2 = n1 + max(8, int(0.4 / est_iter_s))
    times = []
    for n in (n1, n2):
        f = jax.jit(
            lambda x0, n=n: jax.lax.fori_loop(0, n, body, x0).sum()
        )
        float(f(x))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x))
            best = min(best, time.perf_counter() - t0)
        times.append(best)
    return (times[1] - times[0]) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    B, S = 16, 640
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, S, S, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.bfloat16)

    def stats(y):
        yf = y.astype(jnp.float32)
        return yf.mean((0, 1, 2)), (yf * yf).mean((0, 1, 2))

    def xla_conv(x):
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        m, q = stats(y)
        return y.sum() + m.sum() + q.sum()

    def im2col_dot(x):
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        # patches[b, i, j, ky, kx, c] = xp[b, 2i+ky, 2j+kx, c]
        patches = jnp.stack(
            [
                jax.lax.slice(
                    xp, (0, ky, kx, 0), (B, ky + S, kx + S, 3), (1, 2, 2, 1)
                )
                for ky in range(7)
                for kx in range(7)
            ],
            axis=-2,
        )  # (B, 320, 320, 49, 3)
        pf = patches.reshape(B, S // 2, S // 2, 49 * 3)
        y = jax.lax.dot_general(
            pf, w.reshape(49 * 3, 64),
            (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        m, q = stats(y)
        return y.sum() + m.sum() + q.sum()

    for name, fn in [("xla_conv", xla_conv), ("im2col_dot", im2col_dot)]:
        dt = two_point(fn, x)
        print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3)}))


if __name__ == "__main__":
    main()

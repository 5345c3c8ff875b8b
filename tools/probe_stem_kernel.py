"""On-chip A/B: fused Pallas stem conv+stats vs XLA conv + stat reduces.

Candidates produce identical (y, sum, sumsq) for the 7x7/s2/p3 stem at
the flagship shape (B16 @ 640^2, bf16).  Two-point fori_loop timing
(cancels the ~40 ms tunnel RTT), min of 3.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_stem_kernel.py
"""

import json
import time

import numpy as np

BATCH, SIZE = 16, 640


def amortized(fn, x, est_iter_s):
    import jax
    import jax.numpy as jnp

    def body(_, c):
        return (fn(c) * 1e-20 + x.astype(jnp.float32)).astype(x.dtype)

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
    import jax
    import jax.numpy as jnp

    from sihl_tpu.ops.pallas.stem import stem_conv_stats

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.bfloat16)

    def baseline(c):
        y = jax.lax.conv_general_dilated(
            c, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        yf = y.astype(jnp.float32)
        return y, jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))

    cands = [("baseline", baseline)]
    for rows in (16, 8):
        for um in (True, False):
            cands.append(
                (
                    f"pallas_r{rows}_{'unroll' if um else 'rank3'}",
                    lambda c, rows=rows, um=um: stem_conv_stats(
                        c, w, rows_per_tile=rows, unroll_m=um
                    ),
                )
            )

    ref = None
    for name, fn in cands:
        try:
            outs = jax.jit(fn)(x)
            outs = [np.asarray(o, np.float32) for o in outs]
        except Exception as e:  # compile failures are data too
            print(json.dumps({"name": name, "error": str(e)[:200]}), flush=True)
            continue
        if ref is None:
            ref = outs
            diff = 0.0
        else:
            diff = max(
                float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9))
                for a, b in zip(outs, ref)
            )
        dt = amortized(
            lambda c, fn=fn: sum(o.astype(jnp.float32).sum() for o in fn(c)),
            x,
            est_iter_s=2e-3,
        )
        print(
            json.dumps(
                {"name": name, "ms": round(dt * 1e3, 3), "max_rel_diff": diff}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

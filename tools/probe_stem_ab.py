"""On-chip A/B of frozen-stem implementations (ResNet 7x7/s2 stem).

The roofline table shows the stem conv (3-channel input @640^2) running at
13% of the memory ceiling — the 3-wide trailing dim starves the MXU lanes —
and its BN/ReLU + the following 3x3/s2 maxpool add two more elementwise
passes over the 320^2x64 map.  In the flagship bench config level 1 is
frozen (eval-mode BN, stop-gradient), so the whole chain is forward-only
and a fused rewrite is fair game.

Candidates (all produce the pooled (B, 160, 160, 64) map):
  baseline   lax.conv 7x7/s2 + affine + relu + maxpool (what the model runs)
  s2d        2x2 space-to-depth + derived 4x4 conv (+ same epilogue)
  patches    lax.conv_general_dilated_patches im2col + (.,147)@(147,64) matmul
  pallas     fused s2d-im2col matmul + affine + relu + maxpool in one kernel
             (only if sihl_tpu.ops.pallas.stem is importable)

Prints one JSON line per candidate: {"name", "ms", "max_abs_diff"}.
Two-point fori_loop timing (cancels the ~40 ms tunnel RTT), min of 3.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_stem_ab.py
"""

import json
import time

import numpy as np

BATCH, SIZE = 16, 640


def amortized(fn, x, est_iter_s):
    import jax

    def body(_, c):
        return fn(c) * 1e-20 + x

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

    from sihl_tpu.backbones.resnet import _stem_space_to_depth
    from sihl_tpu.ops.image import max_pool2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    def epilogue(y):
        y = y.astype(jnp.float32) * scale + bias
        y = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
        return max_pool2d(y, 3, stride=2, padding=1)

    def baseline(c):
        y = jax.lax.conv_general_dilated(
            c, w, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return epilogue(y)

    def s2d(c):
        return epilogue(_stem_space_to_depth(c, w))

    def patches(c):
        p = jax.lax.conv_general_dilated_patches(
            c, (7, 7), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # feature dim ordering of patches is (c, ky, kx) channel-major
        wmat = w.transpose(2, 0, 1, 3).reshape(147, 64)
        return epilogue(p @ wmat)

    cands = [("baseline", baseline), ("s2d", s2d), ("patches", patches)]
    try:
        from sihl_tpu.ops.pallas.stem import fused_frozen_stem, stem_supported

        if stem_supported(x.shape):
            cands.append(
                ("pallas", lambda c: fused_frozen_stem(c, w, scale, bias))
            )
    except ImportError:
        pass

    ref = None
    for name, fn in cands:
        y = jax.jit(fn)(x)
        y.block_until_ready()
        ynp = np.asarray(y, np.float32)
        if ref is None:
            ref = ynp
            diff = 0.0
        else:
            diff = float(np.abs(ynp - ref).max())
        # reduce to a scalar so the fori_loop carry broadcasts back to x
        dt = amortized(lambda c, fn=fn: fn(c).sum(), x, est_iter_s=2e-3)
        print(
            json.dumps(
                {"name": name, "ms": round(dt * 1e3, 3), "max_abs_diff": diff}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

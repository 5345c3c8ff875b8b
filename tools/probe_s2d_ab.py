"""A/B timing: ResNet-50 backbone fwd+bwd with/without stage-1 s2d.

Runs ONE variant per process (the flag is read at trace time):
    python tools/probe_s2d_ab.py 0   # plain
    python tools/probe_s2d_ab.py 1   # SIHL_TPU_STAGE1_S2D=1

Amortizes K iterations inside one dispatch (lax.fori_loop with a
carry-dependent input perturbation) and consumes every grad leaf, per the
tunnel measurement rules in STATUS.md / tools/probe_perf.py.
"""

import os
import sys
import time

os.environ["SIHL_TPU_STAGE1_S2D"] = sys.argv[1] if len(sys.argv) > 1 else "0"

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import sihl_tpu
    from sihl_tpu import Backbone

    sihl_tpu.set_compute_dtype(jnp.bfloat16)
    bb = Backbone("resnet50", top_level=5, rngs=nnx.Rngs(0))
    bb.set_frozen_levels(1)
    bb.train()
    gd, params, rest = nnx.split(bb, nnx.Param, ...)
    x = jnp.asarray(np.random.RandomState(0).randn(16, 640, 640, 3), jnp.bfloat16)

    K = 10

    @jax.jit
    def run(params, rest, x):
        def loss(both, x):
            params, rest = both
            m = nnx.merge(gd, params, rest)
            feats = m(x)
            l = sum((f.astype(jnp.float32) ** 2).sum() for f in feats[1:])
            _, _, new_rest = nnx.split(m, nnx.Param, ...)
            return l, new_rest

        def body(i, carry):
            acc, rest, x = carry
            # differentiate wrt (params, rest) so BatchStats are traced at
            # the JVP level (their grads are zero and DCE'd)
            g, new_rest = jax.grad(loss, has_aux=True, allow_int=True)(
                (params, rest), x
            )
            gsum = sum(
                l.astype(jnp.float32).sum()
                for l in jax.tree_util.tree_leaves(g[0])
            )
            return acc + gsum, new_rest, x + (gsum * 1e-24).astype(x.dtype)

        acc, _, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0.0), rest, x))
        return acc

    fetch = lambda: float(run(params, rest, x))
    _ = fetch()  # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        _ = fetch()
    dt = (time.perf_counter() - t0) / reps / K
    mode = "s2d" if os.environ["SIHL_TPU_STAGE1_S2D"] == "1" else "plain"
    print(f"RESULT {mode} {dt * 1e3:.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

"""Stage 2 of s2d fault isolation: composition levels.

1. full stage-1 (3 bottlenecks, 64->256) s2d at real shape, fwd+bwd
2. same inside a 3-iteration lax.scan (the bench dispatch shape)
3. full ResNet-50 backbone fwd+bwd with SIHL_TPU_STAGE1_S2D=1

Usage: ... python tools/probe_s2d_fault2.py [start_idx]
"""

import os
import sys

os.environ.setdefault("SIHL_TPU_STAGE1_S2D", "1")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def fetch(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    rs = np.random.RandomState(0)

    from sihl_tpu.backbones.resnet import Bottleneck, _Stage, _stage_s2d

    if start <= 0:
        stage = _Stage(Bottleneck, 64, 64, 3, 1, 1, 64, nnx.Rngs(0))
        stage.train()
        x = jnp.asarray(rs.randn(16, 160, 160, 64), jnp.bfloat16)
        g = nnx.jit(nnx.grad(lambda m, x: (_stage_s2d(m, x) ** 2).sum().astype(jnp.float32)))(stage, x)
        print(f"PASS full_stage {fetch(jax.tree_util.tree_leaves(nnx.state(g))[0]):.4f}", flush=True)

    if start <= 1:
        stage = _Stage(Bottleneck, 64, 64, 3, 1, 1, 64, nnx.Rngs(0))
        stage.train()
        xs = jnp.asarray(rs.randn(3, 16, 160, 160, 64), jnp.bfloat16)
        gd, params0, rest0 = nnx.split(stage, nnx.Param, ...)

        @jax.jit
        def scanned(params0, rest0, xs):
            def body(carry, x):
                params, rest = carry

                def loss(params, x):
                    m = nnx.merge(gd, params, rest)
                    l = (_stage_s2d(m, x) ** 2).sum().astype(jnp.float32)
                    _, _, new_rest = nnx.split(m, nnx.Param, ...)
                    return l, new_rest

                gr, new_rest = jax.grad(loss, has_aux=True)(params, x)
                return (params, new_rest), jax.tree_util.tree_leaves(gr)[0].sum()

            return jax.lax.scan(body, (params0, rest0), xs)

        _, sums = scanned(params0, rest0, xs)
        print(f"PASS scanned_stage {fetch(sums):.4f}", flush=True)

    if start <= 2:
        import sihl_tpu
        from sihl_tpu import Backbone

        sihl_tpu.set_compute_dtype(jnp.bfloat16)
        bb = Backbone("resnet50", top_level=5, rngs=nnx.Rngs(0))
        bb.train()
        x = jnp.asarray(rs.randn(4, 640, 640, 3), jnp.bfloat16)
        g = nnx.jit(nnx.grad(
            lambda m, x: sum((f ** 2).sum() for f in m(x)[1:]).astype(jnp.float32)
        ))(bb, x)
        print(f"PASS backbone {fetch(jax.tree_util.tree_leaves(nnx.state(g))[0]):.4f}", flush=True)

    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()

"""Isolate which ingredient of the stage-1 s2d path faults the TPU worker.

Runs each candidate sub-program in sequence (fwd+bwd, value fetched);
the last PASS line before a crash identifies the culprit.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_s2d_fault.py [start_idx]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def fetch(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def run(name, fn, *args):
    f = jax.jit(jax.grad(lambda *a: (fn(*a) ** 2).sum().astype(jnp.float32)))
    g = f(*args)
    print(f"PASS {name} {fetch(jax.tree_util.tree_leaves(g)[0]):.4f}", flush=True)


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    B, H, W, C = 16, 160, 160, 64
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, C), jnp.bfloat16)
    tests = []

    from sihl_tpu.backbones.resnet import (
        _conv3x3_kernel_s2d,
        _s2d_h,
        _s2d_h_inv,
    )

    # 1: pure fold/unfold
    tests.append(("fold", lambda x: _s2d_h_inv(_s2d_h(x)), (x,)))

    # 2: derived-kernel 3x3 conv on the folded domain
    wk = jnp.asarray(rs.randn(3, 3, C, C) * 0.05, jnp.bfloat16)

    def conv_s2d(x, wk):
        k2 = _conv3x3_kernel_s2d(wk)
        return jax.lax.conv_general_dilated(
            _s2d_h(x), k2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    tests.append(("conv_s2d", conv_s2d, (x, wk)))

    # 3: per-phase pointwise einsum
    wp = jnp.asarray(rs.randn(C, C) * 0.05, jnp.bfloat16)

    def pw(x, wp):
        x2 = _s2d_h(x)
        b, h2, w, c2 = x2.shape
        y = jnp.einsum("bhwpc,cd->bhwpd", x2.reshape(b, h2, w, 2, C), wp)
        return y.reshape(b, h2, w, -1)

    tests.append(("pw_einsum", pw, (x, wp)))

    # 4: BatchNorm on the 5D view (train mode, running stats updated)
    bn = nnx.BatchNorm(C, dtype=jnp.bfloat16, param_dtype=jnp.float32,
                       rngs=nnx.Rngs(0))
    bn.train()

    def bn5(m, x):
        x2 = _s2d_h(x)
        b, h2, w, c2 = x2.shape
        return m(x2.reshape(b, h2, w, 2, C)).reshape(b, h2, w, c2)

    tests.append(("bn_5d", bn, bn5, (x,)))

    # 5: one full s2d bottleneck
    from sihl_tpu.backbones.resnet import Bottleneck, _bottleneck_s2d

    blk = Bottleneck(C, C // 4, stride=1, groups=1, base_width=64,
                     rngs=nnx.Rngs(0))
    blk.train()

    def bneck(m, x):
        return _s2d_h_inv(_bottleneck_s2d(m, _s2d_h(x)))

    tests.append(("bottleneck_s2d", blk, bneck, (x,)))

    for i, entry in enumerate(tests):
        if i < start:
            continue
        if len(entry) == 3:
            name, fn, args = entry
            run(name, fn, *args)
        else:
            name, mod, fn, args = entry
            g = nnx.jit(nnx.grad(lambda m, *a: (fn(m, *a) ** 2).sum().astype(jnp.float32)))(mod, *args)
            print(f"PASS {name} {fetch(jax.tree_util.tree_leaves(nnx.state(g))[0]):.4f}", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()

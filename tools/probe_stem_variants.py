"""Component timing for the fused stem kernel: which part is slow?

Times stripped variants of the stem Pallas kernel at the flagship shape
(grid (16,20), R=16): DMA floor, slab-stack construction only, matmul
only, and the full kernel.  Throwaway diagnostic; numbers land in
STATUS.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_stem_variants.py
"""

import functools
import json
import time

import numpy as np

BATCH, SIZE = 16, 640
import os
R = int(os.environ.get("PROBE_R", "16"))
W2, C, CO, KYN = 320, 3, 64, 7
K = KYN * 4 * 2 * C


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
    from jax.experimental import pallas as pl

    h2 = SIZE // 2
    chunk = 2 * C
    lanes = W2 + 3
    hp2 = h2 + R

    def make_kernel(mode):
        def kern(e0, e1, o0, o1, w, y, *, mode=mode):
            ev = jnp.concatenate([e0[0, 0], e1[0, 0]], axis=1)
            od = jnp.concatenate([o0[0, 0], o1[0, 0]], axis=1)
            if mode == "dma":
                m = jnp.max(ev, axis=(0, 1)) + jnp.max(od, axis=(0, 1))  # (323,)
                y[0] = jnp.broadcast_to(
                    m[:CO].astype(y.dtype)[None, None, :], y.shape[1:]
                )
                return
            if mode == "mmonly":
                s_mat = jnp.broadcast_to(od[0:1, :R, :W2], (K, R, W2))
                ys = []
                for i in range(R):
                    ys.append(
                        jax.lax.dot_general(
                            s_mat[:, i, :], w[:], (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                y[0] = jnp.stack(ys, axis=0).astype(y.dtype)
                return
            if mode == "mmbig":
                a = jnp.broadcast_to(od[0, 0:1, 0:K], (R * W2, K))
                y5 = jax.lax.dot_general(
                    a, w[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (R*W2, CO)
                m = jnp.max(y5, axis=0)  # (CO,)
                y[0] = jnp.broadcast_to(
                    m.astype(y.dtype)[None, None, :], y.shape[1:]
                )
                return
            if mode in ("stack28", "full28"):
                pieces = []
                for ky in range(KYN):
                    src, a = (od, ky // 2) if ky % 2 == 0 else (ev, (ky + 1) // 2)
                    for u in range(4):
                        pieces.append(src[:, a : a + R, u : u + W2])
                s_mat = jnp.concatenate(pieces, axis=0)  # (K, R, W2)
            else:
                slabs = []
                for ky in range(KYN):
                    src, a = (od, ky // 2) if ky % 2 == 0 else (ev, (ky + 1) // 2)
                    for u in range(4):
                        for v in range(chunk):
                            if mode == "stack_a0":
                                slabs.append(src[v, a : a + R, 0:W2])
                            else:
                                slabs.append(src[v, a : a + R, u : u + W2])
                s_mat = jnp.stack(slabs, axis=0)  # (K, R, W2)
            if mode in ("stack", "stack_a0", "stack28"):
                y[0] = jnp.broadcast_to(
                    s_mat[0:1, 0:1, 0:1].astype(y.dtype), y.shape[1:]
                )
                return
            if mode.endswith("T"):
                s_mat = jnp.swapaxes(s_mat, 0, 1)  # (R, K, W2)
            ys = []
            for i in range(R):
                si = s_mat[i] if mode.endswith("T") else s_mat[:, i, :]
                ys.append(
                    jax.lax.dot_general(
                        si, w[:], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            acc = jnp.stack(ys, axis=0)
            y[0] = acc.astype(y.dtype)

        return kern

    def make_kernel7(mode):
        # planes-24 input: u pre-shifted in XLA; k-order (ky, u, v)
        def kern(e0, e1, o0, o1, w, y, *, mode=mode):
            ev = jnp.concatenate([e0[0, 0], e1[0, 0]], axis=1)  # (24, 2R, 323)
            od = jnp.concatenate([o0[0, 0], o1[0, 0]], axis=1)
            pieces = []
            for ky in range(KYN):
                src, a = (od, ky // 2) if ky % 2 == 0 else (ev, (ky + 1) // 2)
                pieces.append(src[:, a : a + R, 0:W2])
            s_mat = jnp.concatenate(pieces, axis=0)  # (K, R, W2)
            if mode.endswith("T"):
                s_mat = jnp.swapaxes(s_mat, 0, 1)
            ys = []
            for i in range(R):
                si = s_mat[i] if mode.endswith("T") else s_mat[:, i, :]
                ys.append(
                    jax.lax.dot_general(
                        si, w[:], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            acc = jnp.stack(ys, axis=0)
            y[0] = acc.astype(y.dtype)

        return kern

    def make_kernel_res(mode):
        # whole-image planes resident in VMEM; dynamic row slices per tile
        def kern(xr, w, y, *, mode=mode):
            j = pl.program_id(1)
            base = j * R
            ev = xr[0, 0, :, pl.ds(base, R + 4), :]  # (chunk, R+4, 323)
            od = xr[0, 1, :, pl.ds(base, R + 4), :]
            pieces = []
            for ky in range(KYN):
                src, a = (od, ky // 2) if ky % 2 == 0 else (ev, (ky + 1) // 2)
                for u in range(4):
                    pieces.append(src[:, a : a + R, u : u + W2])
            s_mat = jnp.concatenate(pieces, axis=0)  # (K, R, W2)
            ys = []
            for i in range(R):
                ys.append(
                    jax.lax.dot_general(
                        s_mat[:, i, :], w[:], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            acc = jnp.stack(ys, axis=0)
            y[0] = acc.astype(y.dtype)

        return kern

    def run(mode, xt, wk):
        if mode == "resident":
            return pl.pallas_call(
                make_kernel_res(mode),
                grid=(BATCH, h2 // R),
                in_specs=[
                    pl.BlockSpec(
                        (1, 2, chunk, hp2, lanes), lambda i, j: (i, 0, 0, 0, 0)
                    ),
                    pl.BlockSpec(wk.shape, lambda i, j: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, R, W2, CO), lambda i, j: (i, j, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BATCH, h2, W2, CO), jnp.bfloat16),
            )(xt, wk)
        nplanes = 24 if mode.startswith("full7") else chunk
        block = (1, 1, nplanes, R, lanes)
        return pl.pallas_call(
            make_kernel7(mode) if mode.startswith("full7") else make_kernel(mode),
            grid=(BATCH, h2 // R),
            in_specs=[
                pl.BlockSpec(block, lambda i, j: (i, 0, 0, j, 0)),
                pl.BlockSpec(block, lambda i, j: (i, 0, 0, j + 1, 0)),
                pl.BlockSpec(block, lambda i, j: (i, 1, 0, j, 0)),
                pl.BlockSpec(block, lambda i, j: (i, 1, 0, j + 1, 0)),
                pl.BlockSpec(wk.shape, lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, R, W2, CO), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BATCH, h2, W2, CO), jnp.bfloat16),
        )(xt, xt, xt, xt, wk)

    rng = np.random.RandomState(0)
    xt = jnp.asarray(
        rng.rand(BATCH, 2, chunk, hp2, lanes), jnp.bfloat16
    )
    xq = jnp.asarray(
        rng.rand(BATCH, 2, 24, hp2, lanes), jnp.bfloat16
    )
    wk = jnp.asarray(rng.randn(K, CO) * 0.1, jnp.bfloat16)

    # also time the XLA-side prep transform alone
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.bfloat16)

    def prep(c):
        flat = c.reshape(BATCH, SIZE, SIZE * 3)
        hp = 2 * h2 + 2 * R
        xp = jnp.pad(flat, ((0, 0), (4, hp - 4 - SIZE), (9, 9)))
        xr = xp.reshape(BATCH, hp // 2, 2, lanes, chunk)
        return xr.transpose(0, 2, 4, 1, 3)


    for mode in ("resident", "full28"):
        try:
            src = xq if mode.startswith("full7") else xt
            dt = amortized(
                lambda c, mode=mode: run(mode, c, wk).astype(jnp.float32).sum(),
                src,
                est_iter_s=2e-3,
            )
            print(json.dumps({"name": mode, "ms": round(dt * 1e3, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"name": mode, "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()

"""Repro: Layout.AUTO input_formats structure for a trainer-like signature.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/repro_layout_cache.py
"""

import jax
import jax.numpy as jnp

import sihl_tpu  # noqa: F401  (enables the persistent compile cache)
from jax.experimental.layout import Format, Layout


def step(carry, xs, targets):
    w, m = carry

    def body(c, batch):
        x, ts = batch; t = ts[0]
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), c[0], (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        loss = jnp.mean(y) + jnp.mean(t["a"]) + jnp.mean(t["b"])
        return ((c[0] + 1e-20 * loss * jnp.ones_like(c[0])).astype(c[0].dtype), c[1]), loss

    return jax.lax.scan(body, (w, m), (xs, targets))


def main():
    w = jnp.ones((7, 7, 3, 64), jnp.bfloat16)
    m = jnp.ones((32,), jnp.float32)
    xs = jnp.ones((4, 8, 128, 128, 3), jnp.float32)
    targets = [{"a": jnp.ones((4, 8, 7)), "b": jnp.ones((4, 8, 2))}]
    compiled = (
        jax.jit(step, donate_argnums=(0,), in_shardings=((None, None), Format(Layout.AUTO), None))
        .lower((w, m), xs, targets)
        .compile()
    )
    fmts = compiled.input_formats
    print("type:", type(fmts))
    print("len:", len(fmts))
    for i, f in enumerate(fmts):
        print(f"[{i}]:", f)
    fmt = fmts[0][1]
    print("chosen ([0][1]):", fmt)
    xs_put = jax.device_put(xs, fmt)
    out = compiled((w, m), xs_put, targets)
    print("exec ok:", float(out[1][-1]))


if __name__ == "__main__":
    main()

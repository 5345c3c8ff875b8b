"""Perf probe: peak MXU rates and training-step ablation on the real chip.

Usage: python tools/probe_perf.py [section ...]
Sections: peak, fwd, bwd, step, head. Default: all.

CAVEATS (learned the hard way, see STATUS.md):
* single-dispatch timings through the tunnel are ~40 ms RTT-dominated —
  amortize inside one dispatch (``lax.fori_loop`` with a carry-dependent
  input perturbation to defeat loop-invariant hoisting);
* consume EVERY output you want timed: XLA dead-code-eliminates unused
  gradient subtrees, silently under-reporting fwd+bwd;
* for per-op truth, use ``jax.profiler.trace`` and parse the device
  events (pid 3) out of ``vm.trace.json.gz`` — they carry
  ``hlo_category``, ``bytes_accessed`` and the full HLO ``long_name``.
"""

import sys
import time

import numpy as np


def timed(fn, reps=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import sihl_tpu
    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import ObjectDetection
    from sihl_tpu.layers import FPN

    sections = set(sys.argv[1:]) or {"peak", "fwd", "bwd", "step", "head"}
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    if "peak" in sections:
        # big matmul: 8192^3 bf16
        n = 8192
        a = jnp.ones((n, n), jnp.bfloat16)
        b = jnp.ones((n, n), jnp.bfloat16)
        f = jax.jit(lambda a, b: (a @ b).sum())
        dt = timed(lambda: float(f(a, b)))
        print(f"matmul {n}^3 bf16: {2 * n**3 / dt / 1e12:.1f} TFLOP/s")

        # conv 3x3 256->256 at 80x80x16 (typical FPN-level conv)
        x = jnp.ones((16, 160, 160, 256), jnp.bfloat16)
        w = jnp.ones((3, 3, 256, 256), jnp.bfloat16)
        conv = jax.jit(
            lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ).sum()
        )
        dt = timed(lambda: float(conv(x, w)))
        flops = 2 * 16 * 160 * 160 * 256 * 256 * 9
        print(f"conv3x3 256ch 160^2 bf16: {flops / dt / 1e12:.1f} TFLOP/s")

        # conv 3x3 64ch at 320x320 (early resnet shape)
        x = jnp.ones((16, 320, 320, 64), jnp.bfloat16)
        w = jnp.ones((3, 3, 64, 64), jnp.bfloat16)
        dt = timed(lambda: float(conv(x, w)))
        flops = 2 * 16 * 320 * 320 * 64 * 64 * 9
        print(f"conv3x3 64ch 320^2 bf16: {flops / dt / 1e12:.1f} TFLOP/s")

    BATCH, S = 16, 640
    sihl_tpu.set_compute_dtype(jnp.bfloat16)
    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet50", top_level=5, rngs=rngs)
    backbone.set_frozen_levels(1)
    neck = FPN(backbone.out_channels, 256, bottom_level=3, top_level=7, rngs=rngs)
    head = ObjectDetection(neck.out_channels, 80, bottom_level=3, top_level=7,
                           max_targets=100, rngs=rngs)
    model = SihlModel(backbone, neck, [head])
    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, S, S, 3), jnp.float32)

    gdef, state = nnx.split(model)

    if "fwd" in sections:
        def bb_only(state, x):
            m = nnx.merge(gdef, state)
            return sum(f.astype(jnp.float32).sum() for f in m.backbone(x))
        f = jax.jit(bb_only)
        dt = timed(lambda: float(f(state, x)))
        print(f"backbone fwd: {dt*1e3:.1f} ms/batch = {BATCH/dt:.0f} img/s")

        def bn_fwd(state, x):
            m = nnx.merge(gdef, state)
            return sum(f.astype(jnp.float32).sum() for f in m.neck(m.backbone(x)))
        f = jax.jit(bn_fwd)
        dt = timed(lambda: float(f(state, x)))
        print(f"backbone+neck fwd: {dt*1e3:.1f} ms/batch = {BATCH/dt:.0f} img/s")

        def full_fwd(state, x):
            m = nnx.merge(gdef, state)
            outs = m(x)
            return sum(jnp.sum(o[1].astype(jnp.float32)) for o in outs)
        f = jax.jit(full_fwd)
        dt = timed(lambda: float(f(state, x)))
        print(f"full fwd (inference): {dt*1e3:.1f} ms/batch = {BATCH/dt:.0f} img/s")

    rng = np.random.RandomState(0)
    classes = np.full((BATCH, 100), -1, np.int32)
    boxes = np.zeros((BATCH, 100, 4), np.float32)
    for b in range(BATCH):
        n = rng.randint(1, 20)
        classes[b, :n] = rng.randint(0, 80, n)
        xy = rng.rand(n, 2) * (S - 64)
        wh = rng.rand(n, 2) * 128 + 8
        boxes[b, :n] = np.concatenate([xy, xy + wh], axis=1)
    classes, boxes = jnp.asarray(classes), jnp.asarray(boxes)

    if "bwd" in sections:
        # fwd+bwd of trunk only, mean-square dummy loss
        def trunk_loss(state, x):
            m = nnx.merge(gdef, state)
            feats = m.neck(m.backbone(x))
            return sum(jnp.mean(jnp.square(f.astype(jnp.float32))) for f in feats[3:])
        g = jax.jit(jax.grad(trunk_loss))
        dt = timed(lambda: jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b[:1] if hasattr(b, 'shape') and b.ndim else b))),
            g(state, x), 0.0))
        print(f"trunk fwd+bwd: {dt*1e3:.1f} ms/batch = {BATCH/dt:.0f} img/s")

    if "head" in sections:
        # head training_step cost on fixed features (fwd+bwd through head only)
        def head_loss(state, x):
            m = nnx.merge(gdef, state)
            feats = [jax.lax.stop_gradient(f) for f in m.neck(m.backbone(x))]
            loss, _ = m.heads[0].training_step(feats, classes, boxes)
            return loss
        g = jax.jit(jax.grad(head_loss))
        dt = timed(lambda: float(jax.tree_util.tree_leaves(g(state, x))[0].sum()))
        print(f"trunk-fwd + head fwd+bwd (trunk stop-grad): {dt*1e3:.1f} ms/batch")

    if "step" in sections:
        def full_loss(state, x):
            m = nnx.merge(gdef, state)
            feats = m.neck(m.backbone(x))
            loss, _ = m.heads[0].training_step(feats, classes, boxes)
            return loss
        g = jax.jit(jax.grad(full_loss))
        dt = timed(lambda: float(jax.tree_util.tree_leaves(g(state, x))[0].sum()))
        print(f"full fwd+bwd (no optimizer): {dt*1e3:.1f} ms/batch = {BATCH/dt:.0f} img/s")


if __name__ == "__main__":
    main()

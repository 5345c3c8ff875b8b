"""A/B: does feeding the stacked bench input in XLA's preferred layout kill
the per-step relayout copy?

ROOFLINE drill (r3) shows `copy.331` — bf16[1,16,640,640,3]
T(8,128)->T(4,128) relayout of each scan step's input slice — costing
0.61 ms/step (0.85% of the 72.2 ms step). If the (K,B,H,W,C) stack is fed
already in the layout the stem conv wants, the slice inherits it and the
copy should disappear.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_input_layout.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from jax.experimental.layout import Format, Layout

    import sihl_tpu
    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import ObjectDetection
    from sihl_tpu.layers import FPN
    from sihl_tpu.training import Trainer
    from sihl_tpu.training.trainer import _make_scan_runner

    sihl_tpu.set_compute_dtype(jnp.bfloat16)
    BATCH, IMAGE_SIZE, NUM_CLASSES, K = 16, 640, 80, 20

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet50", top_level=5, rngs=rngs)
    backbone.set_frozen_levels(1)
    neck = FPN(backbone.out_channels, 256, bottom_level=3, top_level=7, rngs=rngs)
    head = ObjectDetection(
        neck.out_channels, NUM_CLASSES, bottom_level=3, top_level=7,
        max_targets=100, rngs=rngs,
    )
    model = SihlModel(backbone, neck, [head])
    trainer = Trainer(
        model, optimizer="adamw",
        optimizer_kwargs={"lr": 1e-4, "weight_decay": 1e-4, "backbone_lr_factor": 0.1},
        grad_clip=0.1,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
    classes = np.full((BATCH, 100), -1, np.int32)
    boxes = np.zeros((BATCH, 100, 4), np.float32)
    for b in range(BATCH):
        n = rng.randint(1, 20)
        classes[b, :n] = rng.randint(0, NUM_CLASSES, n)
        xy = rng.rand(n, 2) * (IMAGE_SIZE - 64)
        wh = rng.rand(n, 2) * 128 + 8
        boxes[b, :n] = np.concatenate([xy, xy + wh], axis=1)
    targets = {"classes": jnp.asarray(classes), "boxes": jnp.asarray(boxes)}
    xs = jnp.stack([jnp.roll(x, i, axis=0) for i in range(K)]).astype(jnp.bfloat16)
    ts = jax.tree_util.tree_map(lambda v: jnp.stack([v] * K), [targets])

    def timed(run, carry, xs_in, reps=3):
        out = run(carry, xs_in, ts)
        float(out[1]["trainer/loss"].sum())  # warm + sync
        carry = out[0]
        t0 = time.perf_counter()
        accum = []
        for _ in range(reps):
            carry, m = run(carry, xs_in, ts)
            accum.append(m["trainer/loss"].sum())
        float(sum(accum))
        dt = (time.perf_counter() - t0) / reps
        return BATCH * K / dt, carry

    # -- baseline: default layouts, trainer's own runner -------------------
    carry = trainer._scan_carry()
    base_run = trainer._scan_runner
    base_ips, _ = timed(base_run, carry, xs)
    print(json.dumps({"variant": "default_layout", "img_s": round(base_ips, 1)}))

    # -- AUTO input layout on xs -------------------------------------------
    trainer2 = Trainer(
        SihlModel(backbone, neck, [head]), optimizer="adamw",
        optimizer_kwargs={"lr": 1e-4, "weight_decay": 1e-4, "backbone_lr_factor": 0.1},
        grad_clip=0.1,
    )
    graphdef, state = nnx.split((trainer2.model, trainer2.optimizer))
    state = jax.tree_util.tree_map(jnp.copy, state)

    import sihl_tpu.training.trainer as T

    # rebuild the same scan body the trainer uses, but jit with AUTO layout
    # on the xs argument only
    def body(carry, batch):
        m, o = nnx.merge(graphdef, carry)
        xb, tb = batch
        def loss_fn(mm):
            return T._losses(mm, xb, tb)
        (loss, metrics), grads = nnx.value_and_grad(loss_fn, has_aux=True)(m)
        o.update(m, grads)
        metrics["trainer/loss"] = loss
        return nnx.state((m, o)), metrics

    def run2(carry, xs_in, tgts):
        return jax.lax.scan(body, carry, (xs_in, tgts))

    auto = jax.jit(
        run2,
        donate_argnums=(0,),
        in_shardings=(None, Format(Layout.AUTO), None),
    )
    lowered = auto.lower(state, xs, ts)
    comp = lowered.compile()
    xs_fmt = comp.input_formats[0][1]
    print("chosen xs layout:", xs_fmt)
    xs_opt = jax.device_put(xs, xs_fmt)
    auto_ips, _ = timed(comp, state, xs_opt)
    print(json.dumps({"variant": "auto_xs_layout", "img_s": round(auto_ips, 1)}))


if __name__ == "__main__":
    main()

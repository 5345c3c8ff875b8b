"""Headline benchmark: ResNet-50 + FPN object detection, fwd+bwd+optimizer,
images/sec/chip on the attached TPU (BASELINE.json north star).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "canary": N, "canary_retries": N, "degraded": bool}

``vs_baseline`` is measured throughput divided by the target of 2x an
A100's per-chip throughput on the same workload (the driver-specified
goal); the A100 reference for ResNet-50+FPN detection fwd+bwd at 640px,
16-mixed, batch 16 is taken as 200 images/sec, so baseline = 400.

Tunnel-health gate: a benchmark started right after an abnormal TPU
process exit reads ~172-175 img/s instead of ~237 — the device tunnel
silently degrades and takes minutes to recover.  Before accepting a
measurement, this script times a one-rep canary; if it reads below
``SIHL_BENCH_CANARY_MIN`` (default 230 img/s at the default workload)
it sleeps ``SIHL_BENCH_CANARY_SLEEP`` (default 90 s) and retries up to
``SIHL_BENCH_CANARY_ATTEMPTS`` (default 3) times.  The emitted JSON
carries the final canary reading, the retry count, and a ``degraded``
flag so a bad record is self-describing instead of silently wrong.

NB when A/B-ing opt-in variants: the canary times THIS program, so a
genuinely slower variant (e.g. ``SIHL_TPU_REMAT_POLICY=conv`` measured
-15%) trips the gate without any tunnel fault — confirm with a
default-program run on the same tunnel before attributing a low reading
to degradation, or lower ``SIHL_BENCH_CANARY_MIN`` for the variant leg.
"""

import json
import sys
import time

import numpy as np

A100_X2_TARGET = 400.0  # images/sec/chip

import os

BATCH = int(os.environ.get("SIHL_BENCH_BATCH", "16"))
IMAGE_SIZE = 640
NUM_CLASSES = 80
# 40 steps per device dispatch: a realistic production cadence
# (fit(steps_per_dispatch=40)); measured +3.6 img/s over 20 by halving
# the per-dispatch host overhead's amortized share
MEASURE_STEPS = int(os.environ.get("SIHL_BENCH_STEPS", "40"))


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import sihl_tpu
    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import ObjectDetection
    from sihl_tpu.layers import FPN
    from sihl_tpu.training import Trainer

    sihl_tpu.set_compute_dtype(jnp.bfloat16)

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet50", top_level=5, rngs=rngs)
    # canonical reference training config (BASELINE.md:26-29) freezes level 1
    # (the stem); random weights stand in for the unavailable pretrained ones,
    # matching the reference workload's compute shape exactly
    backbone.set_frozen_levels(1)
    neck = FPN(backbone.out_channels, 256, bottom_level=3, top_level=7, rngs=rngs)
    head = ObjectDetection(
        neck.out_channels, NUM_CLASSES, bottom_level=3, top_level=7,
        max_targets=100, rngs=rngs,
    )
    model = SihlModel(backbone, neck, [head])
    trainer = Trainer(
        model,
        optimizer="adamw",
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

    # K steps per device dispatch (lax.scan) — measures device throughput,
    # amortizing host dispatch latency like any production TPU train loop
    def stack(k):
        # feed images in bf16: identical numerics (the stem conv casts its
        # input to the bf16 compute dtype anyway) and half the per-step
        # slice+relayout traffic
        xs = jnp.stack([jnp.roll(x, i, axis=0) for i in range(k)]).astype(jnp.bfloat16)
        ts = jax.tree_util.tree_map(lambda v: jnp.stack([v] * k), targets)
        return xs, ts

    # NB: sync via host transfer — block_until_ready is unreliable through
    # remote-device transports
    xs_m, ts_m = stack(MEASURE_STEPS)
    run = lambda: trainer.training_steps_scanned(xs_m, ts_m)["trainer/loss"].sum()
    _ = float(run())  # compile + warm

    def timed_ips(reps):
        # queue all reps back-to-back and sync ONCE: a per-rep host sync
        # would add a full tunnel round-trip (~40 ms) of device idle per
        # rep, which no production loop pays (steps stream asynchronously)
        t0 = time.perf_counter()
        _losses = float(sum(run() for _rep in range(reps)))
        dt = (time.perf_counter() - t0) / reps
        return BATCH * MEASURE_STEPS / dt

    # canary gate: don't accept a measurement through a degraded tunnel.
    # The default threshold is calibrated for the DEFAULT workload; if
    # batch/steps were overridden and no explicit threshold was given,
    # disable the gate rather than flag a legitimately different
    # throughput as degradation.
    default_workload = BATCH == 16 and MEASURE_STEPS == 40
    canary_env = os.environ.get("SIHL_BENCH_CANARY_MIN")
    if canary_env is None and not default_workload:
        print(
            "canary gate disabled: non-default batch/steps without an "
            "explicit SIHL_BENCH_CANARY_MIN",
            file=sys.stderr,
        )
    canary_min = float(
        canary_env if canary_env is not None else ("230" if default_workload else "0")
    )
    canary_sleep = float(os.environ.get("SIHL_BENCH_CANARY_SLEEP", "90"))
    canary_attempts = int(os.environ.get("SIHL_BENCH_CANARY_ATTEMPTS", "3"))
    canary = timed_ips(1)
    retries = 0
    while canary < canary_min and retries < canary_attempts:
        print(
            f"canary {canary:.1f} img/s < {canary_min:.0f}: tunnel looks "
            f"degraded, sleeping {canary_sleep:.0f}s (retry {retries + 1}/"
            f"{canary_attempts})",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(canary_sleep)
        canary = timed_ips(1)
        retries += 1
    degraded = canary < canary_min

    images_per_sec = timed_ips(3)
    print(
        json.dumps(
            {
                "metric": "resnet50_fpn_detection_train_throughput",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / A100_X2_TARGET, 3),
                "canary": round(canary, 2),
                "canary_retries": retries,
                "degraded": degraded,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Serving-side benchmark: jitted inference throughput + XLA cost analysis
(MFU accounting) for the flagship detection model."""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

import sihl_tpu
from sihl_tpu import Backbone, SihlModel
from sihl_tpu.heads import ObjectDetection
from sihl_tpu.layers import FPN

import os
BATCH = int(os.environ.get("SIHL_INF_BATCH", "16"))
SIZE = int(os.environ.get("SIHL_INF_SIZE", "640"))


def main():
    sihl_tpu.set_compute_dtype(jnp.bfloat16)
    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet50", top_level=5, rngs=rngs)
    neck = FPN(backbone.out_channels, 256, bottom_level=3, top_level=7, rngs=rngs)
    head = ObjectDetection(neck.out_channels, 80, bottom_level=3, top_level=7, rngs=rngs)
    model = SihlModel(backbone, neck, [head])
    model.eval()
    graphdef, state = nnx.split(model)

    def forward(state, x):
        return nnx.merge(graphdef, state)(x)[0]

    x = jnp.asarray(np.random.RandomState(0).rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    jitted = jax.jit(forward)
    lowered = jitted.lower(state, x)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = cost.get("flops", 0.0)
    except Exception:
        flops = 0.0

    # warm + sync via host transfer
    _ = float(jnp.sum(compiled(state, x)[1]))
    t0 = time.perf_counter()
    reps = 20
    outs = [compiled(state, x) for _ in range(reps)]
    # device execution is serialized in dispatch order, so syncing the
    # last rep syncs them all — ONE host round-trip instead of 20
    _ = float(jnp.sum(outs[-1][1]))
    dt = (time.perf_counter() - t0) / reps

    out = {
        "metric": "resnet50_fpn_detection_inference_throughput",
        "value": round(BATCH / dt, 2),
        "unit": "images/sec/chip",
        "latency_ms": round(dt * 1000, 2),
    }
    if flops:
        out["fwd_gflops_per_image"] = round(flops / BATCH / 1e9, 1)
        out["effective_tflops"] = round(flops / dt / 1e12, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

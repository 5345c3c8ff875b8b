"""Segmented TPU timing for the flagship train step: find where the time
goes (backbone / neck / head-loss / backward / optimizer).

Each segment compiles its own jitted program; timing syncs via host
transfer (block_until_ready is unreliable through the tunnel).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import nnx

import sihl_tpu
from sihl_tpu import Backbone, SihlModel
from sihl_tpu.heads import ObjectDetection
from sihl_tpu.layers import FPN

BATCH, SIZE = 16, 640
REPS = 10


def timed(fn, *args):
    out = fn(*args)  # compile + warm
    host_sync(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    host_sync(out)
    return (time.perf_counter() - t0) / REPS


def host_sync(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    s = 0.0
    for leaf in leaves[:1]:
        s += float(jnp.sum(jnp.asarray(leaf, jnp.float32).ravel()[:1]))
    return s


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        c = c[0] if isinstance(c, list) else c
        return c.get("flops", 0.0)
    except Exception:
        return 0.0


def main():
    sihl_tpu.set_compute_dtype(jnp.bfloat16)
    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet50", top_level=5, rngs=rngs)
    neck = FPN(backbone.out_channels, 256, bottom_level=3, top_level=7, rngs=rngs)
    head = ObjectDetection(
        neck.out_channels, 80, bottom_level=3, top_level=7, max_targets=100, rngs=rngs
    )
    model = SihlModel(backbone, neck, [head])
    model.train()
    graphdef, state = nnx.split(model)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3), jnp.float32)
    classes = np.full((BATCH, 100), -1, np.int32)
    boxes = np.zeros((BATCH, 100, 4), np.float32)
    for b in range(BATCH):
        n = rng.randint(1, 20)
        classes[b, :n] = rng.randint(0, 80, n)
        xy = rng.rand(n, 2) * (SIZE - 64)
        wh = rng.rand(n, 2) * 128 + 8
        boxes[b, :n] = np.concatenate([xy, xy + wh], axis=1)
    classes, boxes = jnp.asarray(classes), jnp.asarray(boxes)

    results = {}

    # 1. backbone fwd only
    @jax.jit
    def bb_fwd(state, x):
        m = nnx.merge(graphdef, state)
        return [f.mean() for f in m.backbone(x)]

    results["backbone_fwd"] = timed(bb_fwd, state, x)

    # 2. full model fwd (features + head forward)
    @jax.jit
    def full_fwd(state, x):
        m = nnx.merge(graphdef, state)
        return m(x)

    results["model_fwd"] = timed(full_fwd, state, x)

    # 3. backbone fwd+bwd
    @jax.jit
    def bb_fwdbwd(state, x):
        def loss_fn(state):
            m = nnx.merge(graphdef, state)
            feats = m.backbone(x)
            return sum(jnp.mean(jnp.asarray(f, jnp.float32)) for f in feats)

        return jax.grad(loss_fn)(state)

    results["backbone_fwdbwd"] = timed(bb_fwdbwd, state, x)

    # 4. backbone+neck fwd+bwd
    @jax.jit
    def trunk_fwdbwd(state, x):
        def loss_fn(state):
            m = nnx.merge(graphdef, state)
            feats = m.extract_features(x)
            return sum(jnp.mean(jnp.asarray(f, jnp.float32)) for f in feats)

        return jax.grad(loss_fn)(state)

    results["trunk_fwdbwd"] = timed(trunk_fwdbwd, state, x)

    # 5. full loss fwd only
    @jax.jit
    def loss_fwd(state, x, classes, boxes):
        m = nnx.merge(graphdef, state)
        feats = m.extract_features(x)
        loss, _ = m.heads[0].training_step(feats, classes, boxes)
        return loss

    results["loss_fwd"] = timed(loss_fwd, state, x, classes, boxes)

    # 6. full loss fwd+bwd (no optimizer)
    @jax.jit
    def loss_fwdbwd(state, x, classes, boxes):
        def loss_fn(state):
            m = nnx.merge(graphdef, state)
            feats = m.extract_features(x)
            loss, _ = m.heads[0].training_step(feats, classes, boxes)
            return loss

        return jax.grad(loss_fn)(state)

    results["loss_fwdbwd"] = timed(loss_fwdbwd, state, x, classes, boxes)

    # 7. full train step (trainer path, single step)
    from sihl_tpu.training import Trainer

    trainer = Trainer(
        model,
        optimizer="adamw",
        optimizer_kwargs={"lr": 1e-4, "weight_decay": 1e-4, "backbone_lr_factor": 0.1},
        grad_clip=0.1,
    )
    targets = {"classes": classes, "boxes": boxes}

    def step():
        return trainer.training_step(x, targets)

    out = step()
    host_sync(out["trainer/loss"])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = step()
    host_sync(out["trainer/loss"])
    results["train_step_full"] = (time.perf_counter() - t0) / REPS

    print(json.dumps({k: round(v * 1000, 2) for k, v in results.items()}, indent=1))
    for k, v in results.items():
        print(f"{k:>18}: {v * 1000:8.2f} ms  ({BATCH / v:7.1f} img/s)")


if __name__ == "__main__":
    main()

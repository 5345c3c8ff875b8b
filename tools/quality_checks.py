"""Measured task-quality evidence on the real chip (RESULTS.md source).

Fast synthetic-convergence checks, one per head family.  Each task
builds synthetic data whose signal is trivially learnable (color <->
class, brightness <-> depth, bright squares <-> boxes/keypoints), trains
a small model for a few hundred steps on the attached TPU, runs the real
validation protocol, and prints one JSON line per task:

    {"task": ..., "metric": ..., "value": ..., "expected": ..., "pass": ...}

The committed expected values in RESULTS.md are the regression bar for
future rounds — the analog of the reference's measured results table
(``/root/reference/examples/README.md:11-29``), which cannot be
reproduced here directly because the environment has no datasets.

Usage: python tools/quality_checks.py [task ...]
Tasks: detection classification segmentation keypoints depth instance_seg
quadrilaterals text multilabel regression autoencoding  (default all)
"""

import json
import os
import sys
import time

import numpy as np


def _trainer(model, steps, lr=3e-4, grad_clip=1.0):
    from sihl_tpu.training import Trainer

    return Trainer(
        model,
        optimizer="adamw",
        optimizer_kwargs={"lr": lr, "weight_decay": 1e-4},
        scheduler="cosine",
        scheduler_kwargs={"T_max": steps, "warmup": min(20, steps // 10)},
        grad_clip=grad_clip,
    )


def _run_scanned(trainer, make_batch, steps, k=10, log_every=5):
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    chunks = steps // k
    for chunk in range(chunks):
        r = np.random.RandomState(chunk + 1)
        batches = [make_batch(r) for _ in range(k)]
        xs = jnp.asarray(np.stack([b[0] for b in batches]))
        ts = jax.tree_util.tree_map(
            lambda *vs: jnp.asarray(np.stack(vs)), *[b[1] for b in batches]
        )
        losses = trainer.training_steps_scanned(xs, ts)
        if chunk % log_every == 0 or chunk == chunks - 1:
            print(
                f"  steps {trainer.step}: loss "
                f"{float(losses['trainer/loss'][-1]):.3f} ({time.time()-t0:.0f}s)",
                flush=True,
            )


def _make_val_data(make_batch, n_batches=4, seed=999):
    import jax
    import jax.numpy as jnp

    r = np.random.RandomState(seed)
    data = []
    for _ in range(n_batches):
        x, t = make_batch(r)
        data.append((jnp.asarray(x), jax.tree_util.tree_map(jnp.asarray, t)))
    return data


def _validate(trainer, make_batch, n_batches=4, seed=999, data=None):
    if data is None:
        data = _make_val_data(make_batch, n_batches, seed)
    return trainer.validate(data)


# -- tasks --------------------------------------------------------------------


def check_detection(steps=300):
    """Bright colored squares on dark noise; COCO-protocol mAP."""
    import jax.numpy as jnp
    from flax import nnx

    import sihl_tpu
    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import ObjectDetection
    from sihl_tpu.layers import FPN

    B, S, T = 8, 320, 8

    def make_batch(rng):
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.2
        classes = np.full((B, T), -1, np.int32)
        boxes = np.zeros((B, T, 4), np.float32)
        for b in range(B):
            n = rng.randint(1, 4)
            for t in range(n):
                w, h = rng.randint(40, 90, 2)
                x0 = rng.randint(0, S - w)
                y0 = rng.randint(0, S - h)
                c = rng.randint(0, 2)
                x[b, y0 : y0 + h, x0 : x0 + w] = (
                    [0.9, 0.2, 0.2] if c == 0 else [0.2, 0.2, 0.9]
                )
                classes[b, t] = c
                boxes[b, t] = [x0, y0, x0 + w, y0 + h]
        return x, {"classes": classes, "boxes": boxes}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = ObjectDetection(
        neck.out_channels, 2, bottom_level=3, top_level=5,
        num_channels=128, num_layers=2, max_targets=T, rngs=rngs,
    )
    trainer = _trainer(SihlModel(backbone, neck, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "map_50", float(val["head0/valid/map_50"])


def check_classification(steps=150):
    """Class = dominant color tint; top-1 accuracy."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import MulticlassClassification

    B, S, C = 16, 128, 3
    tints = np.eye(3, dtype=np.float32) * 0.6

    def make_batch(rng):
        y = rng.randint(0, C, B)
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.4 + tints[y][:, None, None, :]
        return x, {"target": y.astype(np.int32)}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = MulticlassClassification(backbone.out_channels, C, rngs=rngs)
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "accuracy", float(val["head0/valid/accuracy"])


def check_segmentation(steps=300):
    """Pixel class = color of the rectangle covering it (bg = 0); mIoU."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import SemanticSegmentation
    from sihl_tpu.layers import FPN

    B, S, C = 8, 256, 4
    colors = np.asarray(
        [[0.1, 0.1, 0.1], [0.9, 0.2, 0.2], [0.2, 0.9, 0.2], [0.2, 0.2, 0.9]],
        np.float32,
    )

    def make_batch(rng):
        y = np.zeros((B, S, S), np.int32)
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.25 + colors[0]
        for b in range(B):
            for _ in range(rng.randint(2, 5)):
                c = rng.randint(1, C)
                w, h = rng.randint(40, 120, 2)
                x0 = rng.randint(0, S - w)
                y0 = rng.randint(0, S - h)
                x[b, y0 : y0 + h, x0 : x0 + w] = (
                    colors[c] + rng.rand(h, w, 3) * 0.25
                )
                y[b, y0 : y0 + h, x0 : x0 + w] = c
        return x, {"targets": y}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = SemanticSegmentation(neck.out_channels, C, rngs=rngs)
    trainer = _trainer(SihlModel(backbone, neck, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "mean_iou", float(val["head0/valid/mean_iou"])


def check_keypoints(steps=300):
    """Keypoints = opposite corners of bright squares; PCK@0.1."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import KeypointDetection
    from sihl_tpu.layers import FPN

    B, S, T, K = 8, 320, 4, 2

    def make_batch(rng):
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.2
        kpts = np.zeros((B, T, K, 2), np.float32)
        vis = np.zeros((B, T, K), bool)
        for b in range(B):
            n = rng.randint(1, 3)
            for t in range(n):
                w = rng.randint(50, 90)
                x0 = rng.randint(0, S - w)
                y0 = rng.randint(0, S - w)
                x[b, y0 : y0 + w, x0 : x0 + w] = [0.8, 0.8, 0.2]
                # distinct corner dots so the two keypoints are separable
                x[b, y0 : y0 + 10, x0 : x0 + 10] = [0.9, 0.1, 0.1]
                x[b, y0 + w - 10 : y0 + w, x0 + w - 10 : x0 + w] = [0.1, 0.1, 0.9]
                kpts[b, t, 0] = [x0 + 5, y0 + 5]
                kpts[b, t, 1] = [x0 + w - 5, y0 + w - 5]
                vis[b, t] = True
        return x, {"keypoints": kpts, "presence": vis}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = KeypointDetection(
        neck.out_channels, K, max_targets=T, num_channels=128, rngs=rngs
    )
    trainer = _trainer(SihlModel(backbone, neck, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "PCK", float(val["head0/valid/PCK"])


def check_depth(steps=200):
    """Depth = 0.1 + 9.9 x brightness; masked MAE."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import DepthEstimation
    from sihl_tpu.layers import FPN

    B, S = 8, 256

    def make_batch(rng):
        base = rng.rand(B, S, S).astype(np.float32)
        # smooth the field so it is resolvable at stride-8 decoding
        k = np.ones((16, 16), np.float32) / 256.0
        from scipy.signal import convolve2d  # scipy is in the torch stack

        smooth = np.stack(
            [convolve2d(b, k, mode="same", boundary="symm") for b in base]
        )
        x = np.repeat(smooth[..., None], 3, axis=-1)
        depth = 0.1 + smooth * 9.9
        masks = np.ones((B, S, S), bool)
        return x.astype(np.float32), {"targets": depth, "masks": masks}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = DepthEstimation(
        neck.out_channels, lower_bound=0.1, upper_bound=10.0, rngs=rngs
    )
    trainer = _trainer(SihlModel(backbone, neck, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "mae", float(val["head0/valid/mae"])


# metric, committed expectation, and the comparison direction
def check_instance_seg(steps=300):
    """Bright colored squares; mask mAP@50 under the segm COCO protocol."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.data import pad_instance_targets
    from sihl_tpu.heads import InstanceSegmentation
    from sihl_tpu.layers import FPN

    B, S, T = int(os.environ.get('MT_B', '8')), 256, 4

    def make_batch(rng):
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.2
        classes, masks = [], []
        for b in range(B):
            n = rng.randint(1, 3)
            cs, ms = [], []
            for _ in range(n):
                w, h = rng.randint(50, 100, 2)
                x0 = rng.randint(0, S - w)
                y0 = rng.randint(0, S - h)
                c = rng.randint(0, 2)
                x[b, y0 : y0 + h, x0 : x0 + w] = (
                    [0.9, 0.2, 0.2] if c == 0 else [0.2, 0.2, 0.9]
                )
                m = np.zeros((S, S), np.uint8)
                m[y0 : y0 + h, x0 : x0 + w] = 1
                cs.append(c)
                ms.append(m)
            classes.append(np.asarray(cs))
            masks.append(np.stack(ms))
        return x, pad_instance_targets(classes, masks, T, mask_size=(S, S))

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = InstanceSegmentation(
        neck.out_channels, 2, bottom_level=3, top_level=5,
        num_channels=128, num_layers=2, max_targets=T, rngs=rngs,
    )
    trainer = _trainer(SihlModel(backbone, neck, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "mask_map_50", float(val["head0/valid/map_50"])


def check_quadrilaterals(steps=800):
    """Axis-aligned bright squares as quads; box-converted mAP@50."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import QuadrilateralDetection
    from sihl_tpu.layers import FPN

    B, S, T = int(os.environ.get('MT_B', '8')), 256, 4

    def make_batch(rng):
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.2
        classes = np.full((B, T), -1, np.int32)
        quads = np.zeros((B, T, 4, 2), np.float32)
        for b in range(B):
            n = rng.randint(1, 3)
            for t in range(n):
                w, h = rng.randint(50, 100, 2)
                x0 = rng.randint(0, S - w)
                y0 = rng.randint(0, S - h)
                c = rng.randint(0, 2)
                x[b, y0 : y0 + h, x0 : x0 + w] = (
                    [0.9, 0.2, 0.2] if c == 0 else [0.2, 0.2, 0.9]
                )
                classes[b, t] = c
                quads[b, t] = [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]
        return x, {"classes": classes, "quads": quads}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = QuadrilateralDetection(
        neck.out_channels, 2, bottom_level=3, top_level=5,
        num_channels=128, num_layers=2, max_targets=T, rngs=rngs,
    )
    trainer = _trainer(SihlModel(backbone, neck, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "map_50", float(val["head0/valid/map_50"])


def check_text(steps=300):
    """Token sequence = left-to-right colored stripes; exact-match accuracy."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.data import pad_text_targets
    from sihl_tpu.heads import TextRecognition

    B, S, NT, L = 16, 128, 4, 3
    palette = np.asarray(
        [[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9], [0.9, 0.9, 0.1]],
        np.float32,
    )

    def make_batch(rng):
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.15
        texts = []
        for b in range(B):
            n = rng.randint(1, L + 1)
            toks = rng.randint(0, NT, n)
            for i, t in enumerate(toks):
                x[b, :, i * (S // L) : i * (S // L) + S // L // 2] = palette[t]
            texts.append(list(toks))
        return x, {"texts": pad_text_targets(texts, L, NT)}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = TextRecognition(
        backbone.out_channels, NT, L, level=3, num_channels=128,
        embedding_dim=256, rngs=rngs,
    )
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "accuracy", float(val["head0/valid/accuracy"])


def check_multilabel(steps=150):
    """Labels = which of three tints appear in the image; accuracy."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import MultilabelClassification

    B, S, C = 16, 128, 3
    tints = np.eye(3, dtype=np.float32) * 0.8

    def make_batch(rng):
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.2
        y = (rng.rand(B, C) > 0.5).astype(np.float32)
        for b in range(B):
            for c in range(C):
                if y[b, c]:
                    x[b, c * 40 : c * 40 + 40, :40] += tints[c]
        return x, {"target": y}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = MultilabelClassification(backbone.out_channels, C, rngs=rngs)
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "accuracy", float(val["head0/valid/accuracy"])


def check_regression(steps=150):
    """Value = mean image brightness in [0, 1]; MAE."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import Regression

    B, S = 16, 128

    def make_batch(rng):
        y = rng.rand(B).astype(np.float32)
        x = (
            rng.rand(B, S, S, 3).astype(np.float32) * 0.2
            + y[:, None, None, None] * 0.8
        )
        return x, {"targets": y}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = Regression(backbone.out_channels, 0.0, 1.0, rngs=rngs)
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "mean_absolute_error", float(val["head0/valid/mean_absolute_error"])


def check_autoencoding(steps=200):
    """Reconstruct smooth two-tone images; MAE (reference bar: 0.06)."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import Autoencoding

    B, S = 16, 128

    def make_batch_ae(rng):
        base = rng.rand(B, 1, 1, 3).astype(np.float32)
        grad = np.linspace(0, 1, S, dtype=np.float32)[None, :, None, None]
        x = np.clip(
            base * (0.3 + 0.7 * grad) + rng.rand(B, S, S, 3) * 0.05, 0, 1
        ).astype(np.float32)
        return x, {"targets": x}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = Autoencoding(backbone.out_channels, rngs=rngs)
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    _run_scanned(trainer, make_batch_ae, steps)
    val = _validate(trainer, make_batch_ae)
    return "mean_absolute_error", float(val["head0/valid/mean_absolute_error"])


def check_metric_learning(steps=200):
    """Identity = one of 8 color tints; 1-NN retrieval accuracy
    (reference bar: 0.79 NN accuracy, ``examples/README.md:20``)."""
    import jax.numpy as jnp
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import MetricLearning

    B, S, I = 16, 128, 8
    rng_t = np.random.RandomState(7)
    tints = rng_t.rand(I, 3).astype(np.float32) * 0.7

    def make_batch(rng):
        y = rng.randint(0, I, B)
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.3 + tints[y][:, None, None, :]
        return x, {"targets": y.astype(np.int32)}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = MetricLearning(backbone.out_channels, I, rngs=rngs)
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    # retrieval protocol mirrors the reference example
    # (examples/metric_learning.py:146-157, QuerySetCallback): the index set
    # IS the validation data — each query is in the index, and
    # validation_step drops rank-0 as self-similarity.  Building the index
    # from disjoint batches would make the rank-0 drop discard the true
    # nearest neighbor.
    # sync_model() is REQUIRED after scanned training — the trained weights
    # live in the scan carry, not in trainer.model, until flushed.
    trainer.sync_model()
    trainer.model.eval()
    head.reset_validation_index_set()
    data = _make_val_data(make_batch)
    for x, t in data:
        feats = trainer.model.extract_features(x)
        head.extend_validation_index_set(feats, t["targets"])
    val = _validate(trainer, make_batch, data=data)
    return "1nn_accuracy", float(val["head0/valid/1nn_accuracy"])


def check_anomaly(steps=200):
    """EfficientAD on smooth textures; anomaly = random-noise patch.
    Image-level accuracy (reference bar: 0.72, ``examples/README.md:15``)."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import AnomalyDetection

    B, S = 8, 128

    def make_images(rng):
        base = rng.rand(B, 1, 1, 3).astype(np.float32) * 0.3 + 0.3
        grad = np.linspace(0, 1, S, dtype=np.float32)[None, :, None, None]
        return np.clip(
            base * (0.6 + 0.4 * grad) + rng.rand(B, S, S, 3) * 0.05, 0, 1
        ).astype(np.float32)

    def make_batch(rng):
        return make_images(rng), {"targets": None}

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = AnomalyDetection(
        backbone.out_channels, num_channels=128, reservoir_size=16384,
        samples_per_step=512, rngs=rngs,
    )
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    r = np.random.RandomState(77)
    trainer.pretrain([(make_images(r), None) for _ in range(4)])
    # the reservoir is a training-side buffer: stream steps unscanned
    import jax.numpy as jnp

    t0 = time.time()
    for step in range(steps):
        m = trainer.training_step(jnp.asarray(make_images(r)), None)
        if step % 50 == 0 or step == steps - 1:
            print(
                f"  steps {step}: loss {float(m['trainer/loss']):.3f}"
                f" ({time.time()-t0:.0f}s)",
                flush=True,
            )
    rv = np.random.RandomState(999)
    clean = make_images(rv)
    anomalous = make_images(rv).copy()
    tgt = np.zeros((B, S, S), np.float32)
    tgt_a = np.zeros((B, S, S), np.float32)
    for b in range(B):
        y0, x0 = rv.randint(10, S - 42, 2)
        anomalous[b, y0 : y0 + 32, x0 : x0 + 32] = rv.rand(32, 32, 3)
        tgt_a[b, y0 : y0 + 32, x0 : x0 + 32] = 1.0
    val = trainer.validate([(clean, {"targets": tgt}), (anomalous, {"targets": tgt_a})])
    return "accuracy", float(val["head0/valid/accuracy"])


def check_view_invariance(steps=300):
    """Barlow Twins on brightness/noise-distorted second views; normalized
    Frobenius norm (reference bar: 0.58, ``examples/README.md:29``).

    Geometry note: the per-batch cross-correlation is estimated from B
    samples, so even a perfect model's off-diagonal has ~1/sqrt(B-1)
    sampling noise and the normalized norm floors at
    1/sqrt(1 + 2(B-1)/D) — the bar is only meaningful with B ~ D.
    Hence B=128, embedding_dim=64 here (floor ~0.45; measured 0.6488 at
    B=64/D=64 whose floor is 0.582 — within 11% of perfect).  Content: a
    per-sample coarse color mosaic (rich invariant signal); the second
    view re-noises and brightness-jitters it."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import ViewInvarianceLearning

    B, S = 128, 64

    def make_batch(rng):
        mosaic = rng.rand(B, 8, 8, 3).astype(np.float32)
        base = np.kron(mosaic, np.ones((1, S // 8, S // 8, 1), np.float32))

        def view(r):
            return np.clip(
                base * (0.8 + 0.4 * r.rand(B, 1, 1, 1))
                + r.randn(B, S, S, 3) * 0.05,
                0,
                1,
            ).astype(np.float32)

        # the second-view target is the raw image array (trainer re-encodes
        # it through the trunk, trainer.py target_is_second_view) — NOT a dict
        return view(rng), view(rng)

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = ViewInvarianceLearning(
        backbone.out_channels, embedding_dim=64, num_channels=64,
        level=4, rngs=rngs,
    )
    trainer = _trainer(SihlModel(backbone, None, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return (
        "normalized_frobenius_norm",
        float(val["head0/valid/normalized_frobenius_norm"]),
    )


def check_panoptic(steps=300):
    """Stuff = dark background vs green field; things = bright squares.
    Panoptic quality (reference row: ``examples/README.md:24``)."""
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.heads import PanopticSegmentation
    from sihl_tpu.heads.panoptic_segmentation import panoptic_targets_from_maps
    from sihl_tpu.layers import FPN

    B, S, T = int(os.environ.get('MT_B', '8')), 256, 4
    STUFF, THINGS = 2, 2

    def make_batch(rng):
        x = rng.rand(B, S, S, 3).astype(np.float32) * 0.2
        sem_b, cls_b, msk_b = [], [], []
        for b in range(B):
            semantic = np.zeros((S, S), np.int32)
            ids = np.zeros((S, S), np.int32)
            # stuff 1: a green horizontal band
            y0 = rng.randint(0, S // 2)
            hband = rng.randint(40, 100)
            x[b, y0 : y0 + hband] = [0.2, 0.7, 0.2]
            semantic[y0 : y0 + hband] = 1
            # things: bright red/blue squares
            for t in range(rng.randint(1, 3)):
                w, h = rng.randint(40, 90, 2)
                xx = rng.randint(0, S - w)
                yy = rng.randint(0, S - h)
                c = rng.randint(0, THINGS)
                x[b, yy : yy + h, xx : xx + w] = (
                    [0.9, 0.2, 0.2] if c == 0 else [0.2, 0.2, 0.9]
                )
                semantic[yy : yy + h, xx : xx + w] = STUFF + c
                ids[yy : yy + h, xx : xx + w] = t + 1
            classes, masks = panoptic_targets_from_maps(
                semantic, ids, STUFF, T, ignore_index=-100
            )
            sem_b.append(semantic)
            cls_b.append(classes)
            msk_b.append(masks)
        return x, {
            "semantic": np.stack(sem_b).astype(np.int32),
            "classes": np.stack(cls_b).astype(np.int32),
            "masks": np.stack(msk_b).astype(np.float32),
        }

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = PanopticSegmentation(
        neck.out_channels, STUFF, THINGS, num_channels=128, num_layers=2,
        max_targets=T, rngs=rngs,
    )
    trainer = _trainer(SihlModel(backbone, neck, [head]), steps)
    _run_scanned(trainer, make_batch, steps)
    val = _validate(trainer, make_batch)
    return "pq", float(val["head0/valid/pq"])


def check_multitask(steps=800):
    """BASELINE config-5 composition (mirrors ``examples/multitask.py``):
    detection + text recognition + depth + metric learning on one trunk.
    Each target rides a different image signal so all four learn at once."""
    import jax.numpy as jnp
    from flax import nnx

    from sihl_tpu import Backbone, SihlModel
    from sihl_tpu.data import pad_text_targets
    from sihl_tpu.heads import (
        DepthEstimation,
        MetricLearning,
        ObjectDetection,
        TextRecognition,
    )
    from sihl_tpu.layers import FPN

    B, S, T = int(os.environ.get('MT_B', '8')), 256, 4
    NT, L = 3, 2  # text tokens / max length
    I = 4  # identities
    # ZERO-SUM (pure-chroma) identity tints, orthogonal to the luminance
    # axis the depth target rides on.  This matters: any tint with a
    # nonzero channel sum shifts apparent brightness, so the depth loss
    # (dense, x10-weighted) actively fights the identity signal in the
    # shared trunk — measured: a gray [0.23]*3 4th tint (colinear with
    # luminance) froze the ArcFace leg at chance (1-NN 0.25) while a
    # linear probe could still decode identity from P5 at 0.84, and
    # switching to these +-u/+-v chroma-plane directions took the same
    # depth+metric pairing from 1-NN 0.47 to 1.00 (CPU isolation,
    # 2026-08-20).  Opposite pairs have cosine -1, cross pairs 0.  The
    # base range [0.25, 0.65] keeps base+tint inside (0.04, 0.86): no
    # clipping against 0/1 and no collision with the 0.95 white square.
    tints = np.asarray(
        [
            [0.177, -0.177, 0.0],
            [-0.177, 0.177, 0.0],
            [0.102, 0.102, -0.204],
            [-0.102, -0.102, 0.204],
        ],
        np.float32,
    )[:I]
    palette = np.asarray(
        [[0.9, 0.1, 0.1], [0.1, 0.9, 0.1], [0.1, 0.1, 0.9]], np.float32
    )

    def make_batch(rng):
        ids = rng.randint(0, I, B)
        # identity tint over a gray base; depth = brightness of that base
        # (recoverable as the channel mean regardless of identity, since
        # the tints are zero-sum)
        base = rng.rand(B, 1, 1, 1).astype(np.float32) * 0.4 + 0.25
        x = np.broadcast_to(base, (B, S, S, 3)).copy() + tints[ids][:, None, None, :]
        depth = 0.1 + np.broadcast_to(base[..., 0], (B, S, S)).copy() * 9.9
        classes = np.full((B, T), -1, np.int32)
        boxes = np.zeros((B, T, 4), np.float32)
        texts = []
        for b in range(B):
            # detection: one bright white square
            w = rng.randint(50, 90)
            x0 = rng.randint(0, S - w)
            y0 = rng.randint(S // 4, S - w)
            x[b, y0 : y0 + w, x0 : x0 + w] = 0.95
            classes[b, 0] = 0
            boxes[b, 0] = [x0, y0, x0 + w, y0 + w]
            # text: colored stripes along the top rows
            n = rng.randint(1, L + 1)
            toks = rng.randint(0, NT, n)
            for i, tk in enumerate(toks):
                x[b, : S // 6, i * (S // L) : i * (S // L) + S // L // 2] = palette[tk]
            texts.append(list(toks))
        return np.clip(x, 0, 1), [
            {"classes": classes, "boxes": boxes},
            {"texts": pad_text_targets(texts, L, NT)},
            {"targets": depth.astype(np.float32), "masks": np.ones((B, S, S), bool)},
            {"targets": ids.astype(np.int32)},
        ]

    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    heads = [
        ObjectDetection(
            neck.out_channels, 1, bottom_level=3, top_level=5,
            num_channels=128, num_layers=2, max_targets=T, rngs=rngs,
        ),
        TextRecognition(
            neck.out_channels, NT, L, level=3, num_channels=128,
            embedding_dim=256, rngs=rngs,
        ),
        DepthEstimation(neck.out_channels, 0.1, 10.0, rngs=rngs),
        # level 2 = backbone C2, below the FPN laterals: the ArcFace
        # embedding needs a feature the detection head is not actively
        # churning.  At the default level 5 the anchor losses' high-
        # variance gradients keep reshaping P5 every step; the collapsed
        # initial embeddings then drive the reference ArcFace formulation
        # into its vanishing-gradient plateau (all class weights anti-
        # aligned, theta -> pi, loss pinned at ln(I)) — measured 1-NN
        # 0.25-0.36 across margin/batch/width/lr variations, vs 1.0 at
        # level 2 (on-chip A/B 2026-08-20; `level` is a reference-exposed
        # constructor param, metric_learning.py:42).
        MetricLearning(
            neck.out_channels, I,
            level=int(os.environ.get("MT_ML_LEVEL", "2")),
            rngs=rngs,
        ),
    ]
    trainer = _trainer(
        SihlModel(backbone, neck, heads),
        steps,
        lr=float(os.environ.get("MT_LR", "3e-4")),
    )
    _run_scanned(trainer, make_batch, steps)
    # flush the scan carry before touching trainer.model (see check_metric_learning)
    trainer.sync_model()
    trainer.model.eval()
    ml_head = heads[3]
    ml_head.reset_validation_index_set()
    # index set = validation data, per the reference's QuerySetCallback
    # protocol (see check_metric_learning)
    data = _make_val_data(make_batch)
    for x, ts in data:
        feats = trainer.model.extract_features(x)
        ml_head.extend_validation_index_set(feats, ts[3]["targets"])
    val = _validate(trainer, make_batch, data=data)
    return [
        ("map_50", float(val["head0/valid/map_50"]), 0.60, "ge"),
        ("text_accuracy", float(val["head1/valid/accuracy"]), 0.70, "ge"),
        ("depth_mae", float(val["head2/valid/mae"]), 1.0, "le"),
        ("1nn_accuracy", float(val["head3/valid/1nn_accuracy"]), 0.70, "ge"),
    ]


TASKS = {
    "detection": (check_detection, 0.70, "ge"),
    "classification": (check_classification, 0.95, "ge"),
    "segmentation": (check_segmentation, 0.70, "ge"),
    "keypoints": (check_keypoints, 0.60, "ge"),
    "depth": (check_depth, 0.60, "le"),
    "instance_seg": (check_instance_seg, 0.60, "ge"),
    "quadrilaterals": (check_quadrilaterals, 0.60, "ge"),
    "text": (check_text, 0.80, "ge"),
    "multilabel": (check_multilabel, 0.95, "ge"),
    "regression": (check_regression, 0.10, "le"),
    "autoencoding": (check_autoencoding, 0.10, "le"),
    "metric_learning": (check_metric_learning, 0.80, "ge"),
    "anomaly": (check_anomaly, 0.70, "ge"),
    "view_invariance": (check_view_invariance, 0.60, "le"),
    "panoptic": (check_panoptic, 0.30, "ge"),
    "multitask": (check_multitask, None, None),  # per-metric bars in the check
}


def main():
    import jax.numpy as jnp

    import sihl_tpu

    sihl_tpu.set_compute_dtype(jnp.bfloat16)
    names = [a for a in sys.argv[1:] if a in TASKS] or list(TASKS)
    results = []
    for name in names:
        fn, expected, direction = TASKS[name]
        print(f"== {name}", flush=True)
        t0 = time.time()
        out = fn()
        # a check returns (metric, value) with the bar in TASKS, or a list
        # of (metric, value, expected, direction) rows (multitask)
        rows = [(*out, expected, direction)] if isinstance(out, tuple) else out
        for metric, value, exp, direc in rows:
            ok = value >= exp if direc == "ge" else value <= exp
            line = {
                "task": name,
                "metric": metric,
                "value": round(value, 4),
                "expected": (">=" if direc == "ge" else "<=") + str(exp),
                "pass": bool(ok),
                "seconds": round(time.time() - t0, 1),
            }
            print(json.dumps(line), flush=True)
            results.append(line)
    print(json.dumps({"all_pass": all(r["pass"] for r in results)}))


if __name__ == "__main__":
    main()

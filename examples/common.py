"""Shared example scaffolding.

The reference examples pull Kaggle datasets (``examples/*.py``); these
examples default to synthetic data so they run anywhere, and accept
``--data DIR`` for a real dataset directory where a loader exists.
Hyperparameters mirror the reference's per-task ``HYPERPARAMS`` dicts
(canonical config: ``examples/object_detection.py:263-315``).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import nnx

import sihl_tpu
from sihl_tpu import Backbone, SihlModel
from sihl_tpu.parallel import make_mesh
from sihl_tpu.training import Trainer


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--backbone", default="resnet18")
    parser.add_argument("--pretrained", action="store_true")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--weight-decay", type=float, default=1e-4)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--data", default=None, help="real dataset directory")
    parser.add_argument("--data-parallel", action="store_true")
    return parser.parse_args()


def build_trainer(model, args, **overrides):
    kwargs = dict(
        optimizer="adamw",
        optimizer_kwargs={
            "lr": args.lr,
            "weight_decay": args.weight_decay,
            "backbone_lr_factor": 0.1,
        },
        grad_clip=0.1,
        mesh=make_mesh() if args.data_parallel else None,
    )
    kwargs.update(overrides)
    return Trainer(model, **kwargs)


def run(args, model_fn, data_fn, val_data_fn=None, data_config=None):
    """Generic example loop: build, train ``--steps`` steps, validate."""
    if args.bf16:
        sihl_tpu.set_compute_dtype(jnp.bfloat16)
    rngs = nnx.Rngs(0)
    backbone = Backbone(
        args.backbone, pretrained=args.pretrained,
        frozen_levels=1 if args.pretrained else 0, rngs=rngs,
    )
    # data first: real-dataset loaders may resolve task facts the model
    # needs (e.g. the image-folder's class count)
    data = data_fn(args)
    model, trainer_overrides = model_fn(backbone, rngs)
    trainer = build_trainer(model, args, **trainer_overrides)
    if data_config:
        trainer.data_config = data_config
    t0 = time.perf_counter()
    metrics = trainer.fit(data, num_steps=args.steps, log_every=max(args.steps // 5, 1))
    dt = time.perf_counter() - t0
    print(f"trained {args.steps} steps in {dt:.1f}s "
          f"({args.steps * args.batch_size / dt:.1f} img/s)")
    for k, v in sorted(metrics.items()):
        print(f"  {k}: {v:.4f}")
    if val_data_fn is not None:
        val_metrics = trainer.validate(val_data_fn(args))
        print("validation:")
        for k, v in sorted(val_metrics.items()):
            print(f"  {k}: {v:.4f}")
    return trainer


def synthetic_images(args, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield rng.rand(args.batch_size, args.image_size, args.image_size, 3).astype(
            np.float32
        )


def split_root(data, train: bool):
    """Prefer a held-out ``<data>/train`` / ``<data>/val`` split directory
    when present; fall back to the flat directory (validation then runs
    the eval pipeline over the same images — still non-augmented)."""
    from pathlib import Path

    root = Path(data)
    sub = root / ("train" if train else "val")
    return sub if sub.is_dir() else root


def image_folder_batches(args, collate=None, augment=None, train=True):
    """Shared ``--data DIR`` loader: class-per-subdirectory image folder
    (Stanford-Cars / MVTec style).  ``train=False`` reads the held-out
    split (when present) through the eval pipeline, one epoch, unshuffled."""
    from sihl_tpu.data import augment as A
    from sihl_tpu.data import datasets as D

    ds = D.ImageFolderDataset(split_root(args.data, train))
    pipe = augment or (
        A.train_pipeline(args.image_size) if train else A.eval_pipeline(args.image_size)
    )
    loader = D.batched_loader(
        ds, args.batch_size, collate or D.collate_classification,
        augment=pipe, shuffle=train, epochs=None if train else 1,
    )
    return ds, loader

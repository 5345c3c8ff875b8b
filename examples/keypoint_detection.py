"""Keypoint detection example (reference
``examples/keypoint_detection.py``: COCO person keypoints)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import KeypointDetection
from sihl_tpu.layers import FPN
from sihl_tpu.data import pad_keypoint_targets

NUM_KEYPOINTS = 17
MAX_TARGETS = 10


def model_fn(backbone, rngs):
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = KeypointDetection(
        neck.out_channels, NUM_KEYPOINTS, max_targets=MAX_TARGETS, rngs=rngs
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args, train=True):
    if args.data:
        # COCO person-keypoints directory
        from pathlib import Path

        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D

        root = Path(args.data)
        split = "train" if train else "val"
        ds = D.CocoDataset(
            root / split,
            root / "annotations" / f"person_keypoints_{split}.json",
            task="keypoints",
        )

        def collate(samples):
            images = np.stack([s["image"] for s in samples]).astype(np.float32)
            targets = pad_keypoint_targets(
                [s.get("keypoints", np.zeros((0, NUM_KEYPOINTS, 2))) for s in samples],
                [s.get("keypoint_visible", np.zeros((0, NUM_KEYPOINTS), bool))
                 for s in samples],
                MAX_TARGETS, NUM_KEYPOINTS,
            )
            return images, targets

        pipe = A.train_pipeline(args.image_size) if train else A.eval_pipeline(args.image_size)
        return D.batched_loader(
            ds, args.batch_size, collate, augment=pipe,
            shuffle=train, epochs=None if train else 1,
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    for x in synthetic_images(args):
        kpts, pres = [], []
        for _ in range(args.batch_size):
            n = rng.randint(1, 4)
            center = rng.rand(n, 1, 2) * (s - 64) + 32
            k = center + rng.randn(n, NUM_KEYPOINTS, 2) * 10
            kpts.append(np.clip(k, 0, s - 1))
            pres.append(rng.rand(n, NUM_KEYPOINTS) > 0.3)
        yield x, pad_keypoint_targets(kpts, pres, MAX_TARGETS, NUM_KEYPOINTS)


def val_data_fn(args):
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

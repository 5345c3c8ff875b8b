"""Object detection example (reference ``examples/object_detection.py``:
COCO 2017, ResNet-50 + HybridEncoder, 90k steps @ 640px).

Canonical full config:
    python object_detection.py --backbone resnet50 --pretrained --bf16 \
        --image-size 640 --batch-size 16 --steps 90000
"""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import ObjectDetection
from sihl_tpu.layers import HybridEncoder
from sihl_tpu.data import pad_detection_targets

NUM_CLASSES = 80
MAX_TARGETS = 100


def model_fn(backbone, rngs):
    neck = HybridEncoder(
        backbone.out_channels, 256, bottom_level=3, top_level=5, rngs=rngs
    )
    head = ObjectDetection(
        neck.out_channels, NUM_CLASSES, bottom_level=3, top_level=5,
        max_targets=MAX_TARGETS, rngs=rngs,
    )
    overrides = dict(
        scheduler="multistep",
        scheduler_kwargs={"milestones": [60_000, 80_000], "gamma": 0.1},
    )
    return SihlModel(backbone, neck, [head]), overrides


def data_fn(args):
    if args.data:
        # real COCO-format directory: <data>/<split> images +
        # <data>/annotations/instances_<split>.json (reference pipeline:
        # flip/photometric/zoom-out/resize/crop-to-static, :174-200)
        return coco_loader(args, split="train", train=True)
    return _synthetic(args)


def coco_loader(args, split: str, train: bool):
    from pathlib import Path

    from sihl_tpu.data import augment as A
    from sihl_tpu.data import datasets as D

    root = Path(args.data)
    ann = root / "annotations" / f"instances_{split}.json"
    ds = D.CocoDataset(root / split, ann, task="boxes")
    pipe = (
        A.train_pipeline(args.image_size)
        if train
        else A.eval_pipeline(args.image_size)
    )
    return D.batched_loader(
        ds,
        args.batch_size,
        D.collate_detection(MAX_TARGETS),
        augment=pipe,
        shuffle=train,
        epochs=None if train else 1,
    )


def _synthetic(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    for x in synthetic_images(args):
        classes, boxes = [], []
        for _ in range(args.batch_size):
            n = rng.randint(1, 8)
            xy = rng.rand(n, 2) * (s - 32)
            wh = rng.rand(n, 2) * 64 + 8
            boxes.append(np.concatenate([xy, np.minimum(xy + wh, s)], axis=1))
            classes.append(rng.randint(0, NUM_CLASSES, n))
        yield x, pad_detection_targets(classes, boxes, MAX_TARGETS)


def val_data_fn(args):
    if args.data:
        return coco_loader(args, split="val", train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

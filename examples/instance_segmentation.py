"""Instance segmentation example (reference
``examples/instance_segmentation.py``: COCO 2017)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import InstanceSegmentation
from sihl_tpu.layers import FPN
from sihl_tpu.data import pad_instance_targets

NUM_CLASSES = 10
MAX_TARGETS = 20


def model_fn(backbone, rngs):
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = InstanceSegmentation(
        neck.out_channels, NUM_CLASSES, max_targets=MAX_TARGETS, rngs=rngs
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args, train=True):
    if args.data:
        # COCO-format directory: <data>/{train,val} images + annotations json
        from pathlib import Path

        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D

        root = Path(args.data)
        split = "train" if train else "val"
        ds = D.CocoDataset(
            root / split, root / "annotations" / f"instances_{split}.json",
            task="masks",
        )
        pipe = A.train_pipeline(args.image_size) if train else A.eval_pipeline(args.image_size)
        return D.batched_loader(
            ds, args.batch_size, D.collate_instance_segmentation(MAX_TARGETS),
            augment=pipe, shuffle=train, epochs=None if train else 1,
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    s = args.image_size // 2
    for x in synthetic_images(args):
        classes, masks = [], []
        for _ in range(args.batch_size):
            n = rng.randint(1, 5)
            ms = np.zeros((n, s, s), np.float32)
            for i in range(n):
                y0, x0 = rng.randint(0, s - 16, 2)
                ms[i, y0 : y0 + 16, x0 : x0 + 16] = 1
            masks.append(ms)
            classes.append(rng.randint(0, NUM_CLASSES, n))
        yield x, pad_instance_targets(classes, masks, MAX_TARGETS, mask_size=(s, s))


def val_data_fn(args):
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

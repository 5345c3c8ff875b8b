"""Semantic segmentation example (reference
``examples/semantic_segmentation.py``: COCO stuff)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import SemanticSegmentation
from sihl_tpu.layers import FPN

NUM_CLASSES = 8


def model_fn(backbone, rngs):
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = SemanticSegmentation(
        neck.out_channels, NUM_CLASSES, ignore_index=255, rngs=rngs
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args, train=True):
    if args.data:
        # <data>/images + <data>/masks label-map pngs
        from common import split_root
        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D

        ds = D.SegmentationFolderDataset(split_root(args.data, train))
        pipe = A.train_pipeline(args.image_size) if train else A.eval_pipeline(args.image_size)
        return D.batched_loader(
            ds, args.batch_size, D.collate_semantic_segmentation,
            augment=pipe, shuffle=train, epochs=None if train else 1,
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    for x in synthetic_images(args):
        yield x, rng.randint(0, NUM_CLASSES, (args.batch_size, s, s))


def val_data_fn(args):
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

"""Multiclass classification example (reference
``examples/multiclass_classification.py``: Stanford Cars, ResNet, no neck)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import MulticlassClassification

NUM_CLASSES = 10


def model_fn(backbone, rngs):
    head = MulticlassClassification(
        backbone.out_channels, NUM_CLASSES, label_smoothing=0.1, rngs=rngs
    )
    return SihlModel(backbone, None, [head]), {}


def data_fn(args):
    if args.data:
        # class-per-subdirectory image folder (Stanford-Cars-style layout)
        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D

        ds = D.ImageFolderDataset(args.data)
        global NUM_CLASSES
        NUM_CLASSES = len(ds.class_names)
        return D.batched_loader(
            ds, args.batch_size, D.collate_classification,
            augment=A.train_pipeline(args.image_size),
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        yield x, rng.randint(0, NUM_CLASSES, args.batch_size)


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn,
        data_config=[{"categories": [str(i) for i in range(NUM_CLASSES)]}])

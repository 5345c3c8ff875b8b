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


def data_fn(args, train=True):
    if args.data:
        # class-per-subdirectory image folder (Stanford-Cars-style layout)
        from common import image_folder_batches

        ds, loader = image_folder_batches(args, train=train)
        global NUM_CLASSES
        NUM_CLASSES = len(ds.class_names)
        return loader
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        yield x, rng.randint(0, NUM_CLASSES, args.batch_size)


def val_data_fn(args):
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn,
        data_config=[{"categories": [str(i) for i in range(NUM_CLASSES)]}])

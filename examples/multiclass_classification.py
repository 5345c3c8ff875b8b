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
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        yield x, rng.randint(0, NUM_CLASSES, args.batch_size)


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn,
        data_config=[{"categories": [str(i) for i in range(NUM_CLASSES)]}])

"""Multilabel classification example (reference
``examples/multilabel_classification.py``: COCO labels)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import MultilabelClassification

NUM_LABELS = 16


def model_fn(backbone, rngs):
    head = MultilabelClassification(backbone.out_channels, NUM_LABELS, rngs=rngs)
    return SihlModel(backbone, None, [head]), {}


def data_fn(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        yield x, (rng.rand(args.batch_size, NUM_LABELS) > 0.8).astype(np.float32)


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn)

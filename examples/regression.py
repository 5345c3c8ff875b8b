"""Scalar regression example (reference ``examples/regression.py``:
age prediction)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import Regression


def model_fn(backbone, rngs):
    head = Regression(backbone.out_channels, lower_bound=0.0, upper_bound=100.0, rngs=rngs)
    return SihlModel(backbone, None, [head]), {}


def data_fn(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        # target correlated with image brightness so the loss can move
        yield x, (x.mean(axis=(1, 2, 3)) * 100).astype(np.float32)


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn)

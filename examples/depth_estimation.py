"""Depth estimation example (reference ``examples/depth_estimation.py``:
NYU-V2)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import DepthEstimation
from sihl_tpu.layers import FPN


def model_fn(backbone, rngs):
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = DepthEstimation(
        neck.out_channels, lower_bound=0.1, upper_bound=10.0, rngs=rngs
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    for x in synthetic_images(args):
        depth = (x.mean(-1) * 9.9 + 0.1).astype(np.float32)
        masks = rng.rand(args.batch_size, s, s) > 0.1
        yield x, {"targets": depth, "masks": masks}


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=lambda a: [next(data_fn(a))])

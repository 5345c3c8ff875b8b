"""Quadrilateral detection example (reference
``examples/quadrilateral_detection.py``: military aircraft)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import QuadrilateralDetection
from sihl_tpu.layers import BiFPN

NUM_CLASSES = 5
MAX_TARGETS = 20


def model_fn(backbone, rngs):
    neck = BiFPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = QuadrilateralDetection(
        neck.out_channels, NUM_CLASSES, max_targets=MAX_TARGETS, rngs=rngs
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    for x in synthetic_images(args):
        classes = np.full((args.batch_size, MAX_TARGETS), -1, np.int32)
        quads = np.zeros((args.batch_size, MAX_TARGETS, 4, 2), np.float32)
        for b in range(args.batch_size):
            n = rng.randint(1, 4)
            for t in range(n):
                cx, cy = rng.rand(2) * (s - 64) + 32
                r = rng.rand() * 16 + 8
                angles = np.sort(rng.rand(4) * 2 * np.pi)
                quads[b, t] = np.stack(
                    [cx + r * np.cos(angles), cy + r * np.sin(angles)], axis=1
                )
                classes[b, t] = rng.randint(0, NUM_CLASSES)
        yield x, {"classes": classes, "quads": quads}


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=lambda a: [next(data_fn(a))])

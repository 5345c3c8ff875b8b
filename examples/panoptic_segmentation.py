"""Panoptic segmentation example (reference
``examples/panoptic_segmentation.py``: COCO panoptic, ResNet-50 + FPN)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import PanopticSegmentation
from sihl_tpu.layers import FPN

STUFF, THINGS = 4, 6
MAX_TARGETS = 20


def model_fn(backbone, rngs):
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = PanopticSegmentation(
        neck.out_channels, STUFF, THINGS, max_targets=MAX_TARGETS,
        soft_label_decay_steps=90_000, ignore_index=255, rngs=rngs,
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    ms = s // 2
    for x in synthetic_images(args):
        semantic = rng.randint(0, STUFF, (args.batch_size, s, s))
        classes = np.full((args.batch_size, MAX_TARGETS), -1, np.int32)
        masks = np.zeros((args.batch_size, MAX_TARGETS, ms, ms), np.float32)
        for b in range(args.batch_size):
            for t in range(rng.randint(1, 4)):
                y0, x0 = rng.randint(0, ms - 16, 2)
                masks[b, t, y0 : y0 + 16, x0 : x0 + 16] = 1
                classes[b, t] = rng.randint(0, THINGS)
                semantic[b, y0 * 2 : y0 * 2 + 32, x0 * 2 : x0 * 2 + 32] = (
                    STUFF + classes[b, t]
                )
        yield x, {"semantic": semantic, "classes": classes, "masks": masks}


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=lambda a: [next(data_fn(a))])

"""Full multitask example (BASELINE config 5): detection + text
recognition + depth + metric learning heads sharing one backbone+neck."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import (
    DepthEstimation,
    MetricLearning,
    ObjectDetection,
    TextRecognition,
)
from sihl_tpu.layers import FPN
from sihl_tpu.data import pad_detection_targets, pad_text_targets

NUM_CLASSES, MAX_TARGETS = 10, 20
NUM_TOKENS, MAX_LEN = 30, 12
NUM_IDENTITIES = 8


def model_fn(backbone, rngs):
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    heads = [
        ObjectDetection(neck.out_channels, NUM_CLASSES, max_targets=MAX_TARGETS, rngs=rngs),
        TextRecognition(neck.out_channels, NUM_TOKENS, MAX_LEN, level=3, rngs=rngs),
        DepthEstimation(neck.out_channels, 0.1, 10.0, rngs=rngs),
        # level 2 (backbone C2, below the FPN laterals): when trained from
        # scratch next to a detection head, an embedding read from P5 gets
        # held in ArcFace's vanishing-gradient plateau by the anchor
        # losses' high-variance gradients (see RESULTS.md, multitask) —
        # C2 gives the metric head a feature map detection is not
        # actively churning
        MetricLearning(neck.out_channels, NUM_IDENTITIES, level=2, rngs=rngs),
    ]
    return SihlModel(backbone, neck, heads), {}


def data_fn(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    for x in synthetic_images(args):
        n = rng.randint(1, 5)
        det = pad_detection_targets(
            [rng.randint(0, NUM_CLASSES, n)] * args.batch_size,
            [np.abs(rng.rand(n, 4)) * s / 2 + np.array([0, 0, s / 2, s / 2])]
            * args.batch_size,
            MAX_TARGETS,
        )
        texts = pad_text_targets(
            [rng.randint(0, NUM_TOKENS, rng.randint(1, MAX_LEN))
             for _ in range(args.batch_size)],
            MAX_LEN, NUM_TOKENS,
        )
        depth = {
            "targets": (x.mean(-1) * 9.9 + 0.1).astype(np.float32),
            "masks": np.ones(x.shape[:3], bool),
        }
        ids = rng.randint(0, NUM_IDENTITIES, args.batch_size)
        yield x, [det, texts, depth, ids]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn)

"""View-invariance (Barlow Twins) example (reference
``examples/view_invariance_learning.py``: Stanford Cars)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import ViewInvarianceLearning


def model_fn(backbone, rngs):
    head = ViewInvarianceLearning(backbone.out_channels, rngs=rngs)
    return SihlModel(backbone, None, [head]), {}


def data_fn(args):
    if args.data:
        # two independent augmentations of the same image (Barlow Twins)
        from common import image_folder_batches
        from sihl_tpu.data import augment as A

        pipe_a = A.train_pipeline(args.image_size, seed=1)
        pipe_b = A.train_pipeline(args.image_size, seed=2)

        def collate(samples):
            v1 = np.stack([pipe_a(s_)["image"] for s_ in samples]).astype(np.float32)
            v2 = np.stack([pipe_b(s_)["image"] for s_ in samples]).astype(np.float32)
            return v1, v2

        return image_folder_batches(args, collate=collate, augment=lambda s_: s_)[1]
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        # second view: brightness/noise distortion of the same image
        view2 = np.clip(x * (0.8 + 0.4 * rng.rand()) + rng.randn(*x.shape) * 0.05, 0, 1)
        yield x, view2.astype(np.float32)


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn)

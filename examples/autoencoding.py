"""Autoencoding example (reference ``examples/autoencoding.py``:
Stanford Cars)."""

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import Autoencoding


def model_fn(backbone, rngs):
    head = Autoencoding(backbone.out_channels, rngs=rngs)
    return SihlModel(backbone, None, [head]), {}


def data_fn(args, train=True):
    if args.data:
        from common import image_folder_batches

        def collate(samples):
            import numpy as np
            x = np.stack([s_["image"] for s_ in samples]).astype("float32")
            return x, x

        return image_folder_batches(args, collate=collate, train=train)[1]
    return _synthetic(args)


def _synthetic(args):
    for x in synthetic_images(args):
        yield x, x  # target = input


def val_data_fn(args):
    # real data: held-out split through the eval pipeline; synthetic: one
    # fixed non-augmented batch
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

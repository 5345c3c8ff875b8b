"""Text recognition example (reference ``examples/text_recognition.py``:
Cyrillic handwriting)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import TextRecognition
from sihl_tpu.data import pad_text_targets

NUM_TOKENS = 33
MAX_LEN = 20


def model_fn(backbone, rngs):
    head = TextRecognition(
        backbone.out_channels, NUM_TOKENS, MAX_LEN, level=3, rngs=rngs
    )
    return SihlModel(backbone, None, [head]), {}


def data_fn(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        texts = [rng.randint(0, NUM_TOKENS, rng.randint(1, MAX_LEN))
                 for _ in range(args.batch_size)]
        yield x, pad_text_targets(texts, MAX_LEN, NUM_TOKENS)


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=lambda a: [next(data_fn(a))])

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
    if args.data:
        # COCO-format directory: image classes -> multi-hot labels
        from pathlib import Path

        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D

        root = Path(args.data)
        ds = D.CocoDataset(
            root / "train", root / "annotations" / "instances_train.json",
            task="boxes",
        )
        global NUM_LABELS
        NUM_LABELS = len(ds.class_names)

        def collate(samples):
            x = np.stack([s_["image"] for s_ in samples]).astype(np.float32)
            y = np.zeros((len(samples), NUM_LABELS), np.float32)
            for i, s_ in enumerate(samples):
                y[i, np.unique(s_.get("classes", np.zeros(0, np.int64)).astype(int))] = 1.0
            return x, y

        return D.batched_loader(
            ds, args.batch_size, collate, augment=A.train_pipeline(args.image_size)
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        yield x, (rng.rand(args.batch_size, NUM_LABELS) > 0.8).astype(np.float32)


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn)

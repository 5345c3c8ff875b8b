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
    if args.data:
        # <data>/images/* + <data>/labels.csv lines "<filename>,<value>"
        from pathlib import Path

        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D

        root = Path(args.data)
        labels = {}
        for line in (root / "labels.csv").read_text().splitlines():
            if "," in line:
                name, value = line.rsplit(",", 1)
                try:
                    labels[name] = float(value)
                except ValueError:
                    continue  # header line
        items = [
            (root / "images" / n, v) for n, v in sorted(labels.items())
            if (root / "images" / n).exists()
        ]

        class _RegDataset:
            def __len__(self):
                return len(items)

            def __getitem__(self, idx):
                path, value = items[idx]
                return {"image": D.load_image(path), "value": value}

        def collate(samples):
            x = np.stack([s_["image"] for s_ in samples]).astype(np.float32)
            return x, np.asarray([s_["value"] for s_ in samples], np.float32)

        return D.batched_loader(
            _RegDataset(), args.batch_size, collate,
            augment=A.train_pipeline(args.image_size),
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        # target correlated with image brightness so the loss can move
        yield x, (x.mean(axis=(1, 2, 3)) * 100).astype(np.float32)


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn)

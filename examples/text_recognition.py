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


def _read_labels(root):
    labels = {}
    for line in (root / "labels.txt").read_text().splitlines():
        if "\t" in line:
            name, text = line.split("\t", 1)
            labels[name] = text
    return labels


def data_fn(args, train=True):
    if args.data:
        # <data>/images/* + <data>/labels.txt lines "<filename>\t<text>";
        # the character vocabulary is built from the TRAIN split's labels
        # (so train/val token ids agree); val-only characters are dropped
        from common import split_root
        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D

        root = split_root(args.data, train)
        labels = _read_labels(root)
        vocab_labels = labels if train else _read_labels(split_root(args.data, True))
        vocab = sorted({ch for t in vocab_labels.values() for ch in t})
        char_to_id = {ch: i for i, ch in enumerate(vocab)}
        global NUM_TOKENS
        NUM_TOKENS = max(len(vocab), 1)

        class _TextDataset:
            def __init__(self):
                self.items = [
                    (root / "images" / n, t) for n, t in sorted(labels.items())
                    if (root / "images" / n).exists()
                ]

            def __len__(self):
                return len(self.items)

            def __getitem__(self, idx):
                path, text = self.items[idx]
                ids = [char_to_id[ch] for ch in text if ch in char_to_id][:MAX_LEN]
                return {"image": D.load_image(path), "text_ids": ids}

        def collate(samples):
            x = np.stack([s_["image"] for s_ in samples]).astype(np.float32)
            return x, pad_text_targets(
                [s_["text_ids"] for s_ in samples], MAX_LEN, NUM_TOKENS
            )

        pipe = (
            A.train_pipeline(args.image_size, zoom=None)
            if train
            else A.eval_pipeline(args.image_size)
        )
        return D.batched_loader(
            _TextDataset(), args.batch_size, collate,
            augment=pipe, shuffle=train, epochs=None if train else 1,
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    for x in synthetic_images(args):
        texts = [rng.randint(0, NUM_TOKENS, rng.randint(1, MAX_LEN))
                 for _ in range(args.batch_size)]
        yield x, pad_text_targets(texts, MAX_LEN, NUM_TOKENS)


def val_data_fn(args):
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

"""Panoptic segmentation example (reference
``examples/panoptic_segmentation.py``: COCO panoptic, ResNet-50 + FPN)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import PanopticSegmentation
from sihl_tpu.layers import FPN

STUFF, THINGS = 4, 6
IGNORE = -100
MAX_TARGETS = 20


def model_fn(backbone, rngs):
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = PanopticSegmentation(
        neck.out_channels, STUFF, THINGS, max_targets=MAX_TARGETS,
        soft_label_decay_steps=90_000, ignore_index=255, rngs=rngs,
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args, train=True):
    if args.data:
        # <data>/images/* + <data>/semantic/* + <data>/instances/* pngs
        # (the reference example's 2-plane target format,
        # examples/panoptic_segmentation.py:377-386)
        from PIL import Image

        from common import split_root
        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D
        from sihl_tpu.heads.panoptic_segmentation import panoptic_targets_from_maps

        root = split_root(args.data, train)
        sem = {p_.stem: p_ for p_ in (root / "semantic").iterdir()}
        ins = {p_.stem: p_ for p_ in (root / "instances").iterdir()}
        items = [
            (p_, sem[p_.stem], ins[p_.stem])
            for p_ in sorted((root / "images").iterdir())
            if p_.stem in sem and p_.stem in ins
        ]

        class _PanopticDataset:
            def __len__(self):
                return len(items)

            def __getitem__(self, idx):
                img_p, sem_p, ins_p = items[idx]
                with Image.open(sem_p) as m:
                    semantic = np.asarray(m).astype(np.int32)
                with Image.open(ins_p) as m:
                    ids = np.asarray(m).astype(np.int32)
                # 2-channel dense map rides through the augmentations
                return {
                    "image": D.load_image(img_p),
                    "dense_map": np.stack([semantic, ids], axis=-1),
                    "dense_pad": IGNORE,
                }

        def collate(samples):
            x = np.stack([s_["image"] for s_ in samples]).astype(np.float32)
            sem_b, cls_b, msk_b = [], [], []
            for s_ in samples:
                d = s_["dense_map"]
                semantic, ids = d[..., 0], d[..., 1]
                classes, masks = panoptic_targets_from_maps(
                    semantic, ids, STUFF, MAX_TARGETS, ignore_index=IGNORE
                )
                sem_b.append(semantic)
                cls_b.append(classes)
                msk_b.append(masks)
            return x, {
                "semantic": np.stack(sem_b).astype(np.int32),
                "classes": np.stack(cls_b).astype(np.int32),
                "masks": np.stack(msk_b).astype(np.float32),
            }

        pipe = (
            A.train_pipeline(args.image_size, distort=False)
            if train
            else A.eval_pipeline(args.image_size)
        )
        return D.batched_loader(
            _PanopticDataset(), args.batch_size, collate,
            augment=pipe, shuffle=train, epochs=None if train else 1,
        )
    return _synthetic(args)


def _synthetic(args):
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


def val_data_fn(args):
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

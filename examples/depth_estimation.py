"""Depth estimation example (reference ``examples/depth_estimation.py``:
NYU-V2)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import DepthEstimation
from sihl_tpu.layers import FPN


def model_fn(backbone, rngs):
    neck = FPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = DepthEstimation(
        neck.out_channels, lower_bound=0.1, upper_bound=10.0, rngs=rngs
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args, train=True):
    if args.data:
        # <data>/images + <data>/depths pngs (same stem); depth values
        # scaled by 1/1000 (millimeter pngs, NYU-V2 style); 0 = invalid
        from common import split_root
        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D

        class _DepthFolder(D.SegmentationFolderDataset):
            def __init__(self, root):
                from pathlib import Path
                root = Path(root)
                self.pairs = []
                depths = {p.stem: p for p in (root / "depths").iterdir()}
                for p in sorted((root / "images").iterdir()):
                    if p.stem in depths:
                        self.pairs.append((p, depths[p.stem]))

            def __getitem__(self, idx):
                from PIL import Image
                img_path, depth_path = self.pairs[idx]
                with Image.open(depth_path) as d:
                    depth = np.asarray(d).astype(np.float32) / 1000.0
                return {"image": D.load_image(img_path), "dense_map": depth,
                        "dense_pad": 0.0}

        def collate(samples):
            x = np.stack([s_["image"] for s_ in samples]).astype(np.float32)
            depth = np.stack([s_["dense_map"] for s_ in samples])
            return x, {"targets": depth, "masks": depth > 0}

        pipe = (
            A.train_pipeline(args.image_size, distort=False)
            if train
            else A.eval_pipeline(args.image_size)
        )
        return D.batched_loader(
            _DepthFolder(split_root(args.data, train)), args.batch_size, collate,
            augment=pipe, shuffle=train, epochs=None if train else 1,
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    for x in synthetic_images(args):
        depth = (x.mean(-1) * 9.9 + 0.1).astype(np.float32)
        masks = rng.rand(args.batch_size, s, s) > 0.1
        yield x, {"targets": depth, "masks": masks}


def val_data_fn(args):
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

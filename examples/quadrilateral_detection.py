"""Quadrilateral detection example (reference
``examples/quadrilateral_detection.py``: military aircraft)."""

import numpy as np

from common import parse_args, run, synthetic_images
from sihl_tpu import SihlModel
from sihl_tpu.heads import QuadrilateralDetection
from sihl_tpu.layers import BiFPN

NUM_CLASSES = 5
MAX_TARGETS = 20


def model_fn(backbone, rngs):
    neck = BiFPN(backbone.out_channels, 128, bottom_level=3, top_level=5, rngs=rngs)
    head = QuadrilateralDetection(
        neck.out_channels, NUM_CLASSES, max_targets=MAX_TARGETS, rngs=rngs
    )
    return SihlModel(backbone, neck, [head]), {}


def data_fn(args, train=True):
    if args.data:
        # COCO-format directory; each annotation's segmentation polygon
        # becomes a quad (4-vertex polygons directly, otherwise the
        # min-area rectangle)
        from pathlib import Path

        import cv2

        from sihl_tpu.data import augment as A
        from sihl_tpu.data import datasets as D
        from sihl_tpu.data import pad_detection_targets

        root = Path(args.data)
        split = "train" if train else "val"
        base = D.CocoDataset(
            root / split, root / "annotations" / f"instances_{split}.json",
            task="boxes",
        )

        class _QuadDataset:
            def __len__(self):
                return len(base.items)

            def __getitem__(self, idx):
                info, anns = base.items[idx]
                sample = {"image": D.load_image(base.image_dir / info["file_name"])}
                quads, classes = [], []
                for a in anns:
                    segm = a.get("segmentation")
                    if isinstance(segm, list) and segm:
                        pts = np.asarray(segm[0], np.float32).reshape(-1, 2)
                        if len(pts) == 4:
                            quads.append(pts)
                        else:
                            quads.append(cv2.boxPoints(cv2.minAreaRect(pts)))
                    else:
                        x0, y0, w, h = a["bbox"]
                        quads.append(np.asarray(
                            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]],
                            np.float32,
                        ))
                    classes.append(base.cat_index[a["category_id"]])
                sample["quads"] = np.asarray(quads, np.float32).reshape(-1, 4, 2)
                sample["classes"] = np.asarray(classes, np.int32)
                return sample

        def collate(samples):
            x = np.stack([s_["image"] for s_ in samples]).astype(np.float32)
            classes = np.full((len(samples), MAX_TARGETS), -1, np.int32)
            quads = np.zeros((len(samples), MAX_TARGETS, 4, 2), np.float32)
            for i, s_ in enumerate(samples):
                n = min(len(s_.get("classes", [])), MAX_TARGETS)
                if n:
                    classes[i, :n] = s_["classes"][:n]
                    quads[i, :n] = s_["quads"][:n]
            return x, {"classes": classes, "quads": quads}

        pipe = A.train_pipeline(args.image_size) if train else A.eval_pipeline(args.image_size)
        return D.batched_loader(
            _QuadDataset(), args.batch_size, collate,
            augment=pipe, shuffle=train, epochs=None if train else 1,
        )
    return _synthetic(args)


def _synthetic(args):
    rng = np.random.RandomState(0)
    s = args.image_size
    for x in synthetic_images(args):
        classes = np.full((args.batch_size, MAX_TARGETS), -1, np.int32)
        quads = np.zeros((args.batch_size, MAX_TARGETS, 4, 2), np.float32)
        for b in range(args.batch_size):
            n = rng.randint(1, 4)
            for t in range(n):
                cx, cy = rng.rand(2) * (s - 64) + 32
                r = rng.rand() * 16 + 8
                angles = np.sort(rng.rand(4) * 2 * np.pi)
                quads[b, t] = np.stack(
                    [cx + r * np.cos(angles), cy + r * np.sin(angles)], axis=1
                )
                classes[b, t] = rng.randint(0, NUM_CLASSES)
        yield x, {"classes": classes, "quads": quads}


def val_data_fn(args):
    if args.data:
        return data_fn(args, train=False)
    return [next(_synthetic(args))]


if __name__ == "__main__":
    run(parse_args(), model_fn, data_fn, val_data_fn=val_data_fn)

"""Input pipeline utilities (SURVEY.md §2.6: the torch DataLoader
equivalent).

TPU training wants **fixed-size** batches of padded, masked targets.  The
helpers here pad ragged per-image annotations into the heads' target
contracts on host, and :class:`DevicePrefetcher` overlaps host→device
transfer with compute (double buffering).
"""

import random as _random
import threading
import queue as _queue
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np

from sihl_tpu.utils import random_pad  # noqa: F401  (re-export)
from sihl_tpu.data.native import (  # noqa: F401
    batch_resize_normalize,
    native_available,
    native_pad_labels,
)


# -- target padding ---------------------------------------------------------


def pad_detection_targets(
    classes: Sequence[np.ndarray],
    boxes: Sequence[np.ndarray],
    max_targets: int,
) -> Dict[str, np.ndarray]:
    """Ragged per-image (classes, boxes) lists -> padded batch dict
    (classes: (B, T) int32 with -1 padding; boxes: (B, T, 4))."""
    batch = len(classes)
    out_classes = np.full((batch, max_targets), -1, np.int32)
    out_boxes = np.zeros((batch, max_targets, 4), np.float32)
    for b, (c, bx) in enumerate(zip(classes, boxes)):
        n = min(len(c), max_targets)
        out_classes[b, :n] = np.asarray(c[:n], np.int32)
        out_boxes[b, :n] = np.asarray(bx[:n], np.float32)
    return {"classes": out_classes, "boxes": out_boxes}


def pad_instance_targets(
    classes: Sequence[np.ndarray],
    masks: Sequence[np.ndarray],
    max_targets: int,
    mask_size: Optional[tuple] = None,
) -> Dict[str, np.ndarray]:
    """Ragged (classes, masks) -> padded {classes (B,T), masks (B,T,H,W)}."""
    batch = len(classes)
    if mask_size is None:
        mask_size = masks[0].shape[-2:] if len(masks[0]) else (1, 1)
    out_classes = np.full((batch, max_targets), -1, np.int32)
    out_masks = np.zeros((batch, max_targets) + tuple(mask_size), np.float32)
    for b, (c, m) in enumerate(zip(classes, masks)):
        n = min(len(c), max_targets)
        out_classes[b, :n] = np.asarray(c[:n], np.int32)
        for t in range(n):
            mm = np.asarray(m[t], np.float32)
            if mm.shape != tuple(mask_size):
                ys = (np.arange(mask_size[0]) * mm.shape[0] / mask_size[0]).astype(int)
                xs = (np.arange(mask_size[1]) * mm.shape[1] / mask_size[1]).astype(int)
                mm = mm[ys][:, xs]
            out_masks[b, t] = mm
    return {"classes": out_classes, "masks": out_masks}


def pad_keypoint_targets(
    keypoints: Sequence[np.ndarray],
    presence: Sequence[np.ndarray],
    max_targets: int,
    num_keypoints: int,
) -> Dict[str, np.ndarray]:
    batch = len(keypoints)
    out_k = np.zeros((batch, max_targets, num_keypoints, 2), np.float32)
    out_p = np.zeros((batch, max_targets, num_keypoints), bool)
    for b, (k, p) in enumerate(zip(keypoints, presence)):
        n = min(len(k), max_targets)
        if n:
            out_k[b, :n] = np.asarray(k[:n], np.float32)
            out_p[b, :n] = np.asarray(p[:n], bool)
    return {"keypoints": out_k, "presence": out_p}


def pad_text_targets(
    texts: Sequence[Sequence[int]], max_length: int, pad_id: int
) -> np.ndarray:
    out = np.full((len(texts), max_length), pad_id, np.int32)
    for b, t in enumerate(texts):
        n = min(len(t), max_length)
        out[b, :n] = np.asarray(list(t)[:n], np.int32)
    return out


# -- batching / prefetch ----------------------------------------------------


class ArrayDataset:
    """In-memory dataset of (image, target) pairs with map-style access."""

    def __init__(self, images, targets=None):
        self.images = images
        self.targets = targets

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        t = None if self.targets is None else _tree_index(self.targets, i)
        return self.images[i], t


def _tree_index(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def batched(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = None,
) -> Iterator:
    """Yield (stacked images, stacked targets) batches; loops ``epochs``
    times (forever if None)."""
    rng = _random.Random(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = list(range(len(dataset)))
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order) - (batch_size - 1 if drop_last else 0), batch_size):
            idx = order[start : start + batch_size]
            if drop_last and len(idx) < batch_size:
                continue
            items = [dataset[i] for i in idx]
            images = np.stack([np.asarray(im) for im, _ in items])
            targets = items[0][1]
            if targets is not None:
                targets = jax.tree_util.tree_map(
                    lambda *xs: np.stack([np.asarray(x) for x in xs]),
                    *[t for _, t in items],
                )
            yield images, targets
        epoch += 1


class DevicePrefetcher:
    """Background-thread host->device prefetch with a small buffer, the
    functional stand-in for torch DataLoader workers + pinned memory."""

    def __init__(self, iterator: Iterable, buffer_size: int = 2, sharding=None):
        self.iterator = iter(iterator)
        self.sharding = sharding
        self.q = _queue.Queue(maxsize=buffer_size)
        self._done = object()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _put(self, batch):
        if self.sharding is not None:
            batch = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.sharding), batch
            )
        else:
            batch = jax.tree_util.tree_map(jax.device_put, batch)
        self.q.put(batch)

    def _worker(self):
        try:
            for batch in self.iterator:
                self._put(batch)
        finally:
            self.q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._done:
            raise StopIteration
        return item

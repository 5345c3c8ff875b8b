import numpy as np
import jax.numpy as jnp

from sihl_tpu.data import (
    ArrayDataset,
    DevicePrefetcher,
    batched,
    pad_detection_targets,
    pad_instance_targets,
    pad_keypoint_targets,
    pad_text_targets,
)


def test_pad_detection_targets():
    classes = [np.array([1, 2]), np.array([], np.int64)]
    boxes = [np.array([[0, 0, 5, 5], [1, 1, 2, 2]]), np.zeros((0, 4))]
    out = pad_detection_targets(classes, boxes, max_targets=4)
    assert out["classes"].shape == (2, 4)
    assert out["classes"][0, 0] == 1 and out["classes"][0, 2] == -1
    assert (out["classes"][1] == -1).all()
    assert out["boxes"].shape == (2, 4, 4)


def test_pad_instance_targets_resizes_masks():
    classes = [np.array([0])]
    masks = [np.ones((1, 16, 16))]
    out = pad_instance_targets(classes, masks, max_targets=2, mask_size=(8, 8))
    assert out["masks"].shape == (1, 2, 8, 8)
    assert out["masks"][0, 0].sum() == 64


def test_pad_keypoint_and_text():
    out = pad_keypoint_targets([np.ones((2, 3, 2))], [np.ones((2, 3), bool)], 4, 3)
    assert out["keypoints"].shape == (1, 4, 3, 2)
    assert out["presence"][0, :2].all() and not out["presence"][0, 2:].any()
    texts = pad_text_targets([[1, 2, 3], [4]], max_length=5, pad_id=9)
    assert texts.tolist() == [[1, 2, 3, 9, 9], [4, 9, 9, 9, 9]]


def test_batched_and_prefetch():
    images = np.arange(10 * 4 * 4 * 3, dtype=np.float32).reshape(10, 4, 4, 3)
    targets = np.arange(10)
    ds = ArrayDataset(images, targets)
    batches = list(batched(ds, batch_size=4, epochs=1))
    assert len(batches) == 2  # drop_last
    x, y = batches[0]
    assert x.shape == (4, 4, 4, 3) and y.shape == (4,)

    fetched = list(DevicePrefetcher(batched(ds, batch_size=4, epochs=1)))
    assert len(fetched) == 2
    assert isinstance(fetched[0][0], jnp.ndarray)


def test_batched_shuffle_deterministic():
    ds = ArrayDataset(np.arange(8).reshape(8, 1), np.arange(8))
    a = [y.tolist() for _, y in batched(ds, 4, shuffle=True, seed=1, epochs=1)]
    b = [y.tolist() for _, y in batched(ds, 4, shuffle=True, seed=1, epochs=1)]
    assert a == b

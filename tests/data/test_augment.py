"""Hand-checked coordinate transforms for the host-side augmentation."""

import numpy as np

from sihl_tpu.data import augment as A


def _sample(h=8, w=10):
    img = np.zeros((h, w, 3), np.float32)
    img[2, 3] = 1.0  # marker pixel at (y=2, x=3)
    return {
        "image": img,
        "boxes": np.array([[1.0, 2.0, 4.0, 5.0]], np.float32),
        "classes": np.array([7], np.int32),
        "masks": np.zeros((1, h, w), np.float32),
        "keypoints": np.array([[[3.0, 2.0], [9.0, 7.0]]], np.float32),
        "keypoint_visible": np.array([[True, True]]),
    }


def test_horizontal_flip_coords():
    s = _sample()
    s["masks"][0, 2, 3] = 1.0
    out = A.horizontal_flip(s)
    # marker pixel moves x: 3 -> w-1-3 = 6
    assert out["image"][2, 6, 0] == 1.0
    # box [1,2,4,5] with w=10 -> [10-4, 2, 10-1, 5] = [6,2,9,5]
    np.testing.assert_allclose(out["boxes"][0], [6, 2, 9, 5])
    # keypoint x: 3 -> 10-3 = 7
    np.testing.assert_allclose(out["keypoints"][0, 0], [7, 2])
    assert out["masks"][0, 2, 6] == 1.0


def test_zoom_out_offsets():
    s = _sample()
    rng = np.random.RandomState(0)
    out = A.zoom_out(s, rng, side_range=(1.5, 1.5))
    nh, nw = out["image"].shape[:2]
    assert (nh, nw) == (12, 15)
    # recover the offset from the box shift and check every field agrees
    left = out["boxes"][0, 0] - 1.0
    top = out["boxes"][0, 1] - 2.0
    np.testing.assert_allclose(out["boxes"][0], [1 + left, 2 + top, 4 + left, 5 + top])
    np.testing.assert_allclose(out["keypoints"][0, 0], [3 + left, 2 + top])
    assert out["image"][int(2 + top), int(3 + left), 0] == 1.0


def test_resize_max_size_cap():
    s = _sample(h=8, w=16)
    out = A.resize(s, 8, max_size=12)
    # shorter->8 would make longer 16 -> 12 cap wins: scale = 12/16 = 0.75
    assert out["image"].shape[:2] == (6, 12)
    np.testing.assert_allclose(out["boxes"][0], [0.75, 1.5, 3.0, 3.75])
    np.testing.assert_allclose(out["keypoints"][0, 0], [2.25, 1.5])


def test_random_crop_shift_clip_and_visibility():
    s = _sample(h=8, w=10)
    rng = np.random.RandomState(3)
    out = A.random_crop(s, 6, rng)
    assert out["image"].shape[:2] == (6, 6)
    # recompute offsets deterministically with the same seed
    rng2 = np.random.RandomState(3)
    top, left = rng2.randint(0, 8 - 6 + 1), rng2.randint(0, 10 - 6 + 1)
    np.testing.assert_allclose(
        out["boxes"][0],
        [
            np.clip(1 - left, 0, 6),
            np.clip(2 - top, 0, 6),
            np.clip(4 - left, 0, 6),
            np.clip(5 - top, 0, 6),
        ],
    )
    # keypoint (9,7) lands outside any 6x6 window from (top,left) -> invisible
    assert not out["keypoint_visible"][0, 1]
    assert out["keypoint_visible"][0, 0] == (
        0 <= 3 - left < 6 and 0 <= 2 - top < 6
    )


def test_random_crop_pads_small_images():
    s = _sample(h=4, w=5)
    rng = np.random.RandomState(0)
    out = A.random_crop(s, 6, rng)
    assert out["image"].shape[:2] == (6, 6)
    assert out["masks"].shape[1:] == (6, 6)


def test_sanitize_drops_degenerate_boxes():
    s = {
        "image": np.zeros((4, 4, 3), np.float32),
        "boxes": np.array([[0, 0, 2, 2], [1, 1, 1.2, 3]], np.float32),
        "classes": np.array([0, 1], np.int32),
    }
    out = A.sanitize(s, min_size=1.0)
    assert len(out["boxes"]) == 1 and out["classes"].tolist() == [0]


def test_dense_map_follows_image():
    s = {
        "image": np.zeros((8, 10, 3), np.float32),
        "dense_map": np.arange(80, dtype=np.int32).reshape(8, 10),
        "dense_pad": -1,
    }
    out = A.horizontal_flip(s)
    assert out["dense_map"][0, 0] == 9
    rng = np.random.RandomState(0)
    out2 = A.random_crop(s, 12, rng)  # needs padding on both axes
    assert out2["dense_map"].shape == (12, 12)
    assert (out2["dense_map"][:, 10:] == -1).all() and (out2["dense_map"][8:] == -1).all()


def test_train_pipeline_static_output():
    pipe = A.train_pipeline(32, seed=0)
    for _ in range(5):
        out = pipe(_sample(h=40, w=25))
        assert out["image"].shape == (32, 32, 3)
        if len(out["boxes"]):
            assert (out["boxes"] >= 0).all() and (out["boxes"] <= 32).all()


def test_quads_follow_transforms():
    s = {
        "image": np.zeros((8, 10, 3), np.float32),
        "quads": np.array([[[1, 2], [4, 2], [4, 5], [1, 5]]], np.float32),
        "classes": np.array([0], np.int32),
    }
    out = A.horizontal_flip(s)
    # x -> W - x: [1,4,4,1] -> [9,6,6,9]
    np.testing.assert_allclose(out["quads"][0, :, 0], [9, 6, 6, 9])
    np.testing.assert_allclose(out["quads"][0, :, 1], [2, 2, 5, 5])

    out = A.resize(s, 4, max_size=5)  # scale = 4/8 = 0.5 (cap 5/10 = 0.5 too)
    np.testing.assert_allclose(out["quads"][0], np.asarray(s["quads"][0]) * 0.5)

    rng = np.random.RandomState(1)
    out = A.zoom_out(s, rng, side_range=(1.5, 1.5))
    left = out["quads"][0, 0, 0] - 1.0
    top = out["quads"][0, 0, 1] - 2.0
    np.testing.assert_allclose(out["quads"][0], s["quads"][0] + [left, top])

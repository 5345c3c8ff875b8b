"""Loader tests over a synthetic on-disk dataset (no network)."""

import json

import numpy as np
import pytest

from sihl_tpu.data import augment as A
from sihl_tpu.data import datasets as D


def _write_img(path, h=20, w=24, seed=0):
    from PIL import Image

    arr = (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def image_folder(tmp_path):
    for cls in ("cat", "dog"):
        (tmp_path / cls).mkdir()
        for i in range(3):
            _write_img(tmp_path / cls / f"{i}.png", seed=i)
    return tmp_path


def test_image_folder(image_folder):
    ds = D.ImageFolderDataset(image_folder)
    assert len(ds) == 6 and ds.class_names == ["cat", "dog"]
    s = ds[0]
    assert s["image"].shape == (20, 24, 3) and s["label"] == 0


def test_image_folder_batched_loader(image_folder):
    ds = D.ImageFolderDataset(image_folder)
    pipe = A.eval_pipeline(16)
    it = D.batched_loader(
        ds, 2, D.collate_classification, augment=pipe, workers=2, epochs=1
    )
    batches = list(it)
    assert len(batches) == 3
    x, y = batches[0]
    assert x.shape == (2, 16, 16, 3) and y.shape == (2,)


@pytest.fixture
def coco_dir(tmp_path):
    img_dir = tmp_path / "val"
    img_dir.mkdir()
    for i in range(2):
        _write_img(img_dir / f"{i:04d}.jpg", h=30, w=40, seed=i)
    ann = {
        "images": [
            {"id": 1, "file_name": "0000.jpg", "height": 30, "width": 40},
            {"id": 2, "file_name": "0001.jpg", "height": 30, "width": 40},
            {"id": 3, "file_name": "missing.jpg", "height": 30, "width": 40},
        ],
        "categories": [{"id": 5, "name": "cat"}, {"id": 9, "name": "dog"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 5, "iscrowd": 0,
             "bbox": [2, 3, 10, 8],
             "segmentation": [[2, 3, 12, 3, 12, 11, 2, 11]],
             "keypoints": [4, 5, 2, 0, 0, 0]},
            {"id": 2, "image_id": 1, "category_id": 9, "iscrowd": 1,
             "bbox": [0, 0, 5, 5]},
            {"id": 3, "image_id": 2, "category_id": 9, "iscrowd": 0,
             "bbox": [1, 1, 6, 6],
             "segmentation": [[1, 1, 7, 1, 7, 7]],
             "keypoints": [2, 2, 1, 3, 3, 0]},
            {"id": 4, "image_id": 3, "category_id": 5, "iscrowd": 0,
             "bbox": [0, 0, 1, 1]},
        ],
    }
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return img_dir, ann_file


def test_coco_boxes(coco_dir):
    img_dir, ann_file = coco_dir
    ds = D.CocoDataset(img_dir, ann_file, task="boxes")
    assert len(ds) == 2  # missing image + crowd skipped
    s = ds[0]
    # xywh [2,3,10,8] -> xyxy [2,3,12,11]; category 5 -> contiguous 0
    np.testing.assert_allclose(s["boxes"][0], [2, 3, 12, 11])
    assert s["classes"].tolist() == [0]


def test_coco_masks(coco_dir):
    img_dir, ann_file = coco_dir
    ds = D.CocoDataset(img_dir, ann_file, task="masks")
    s = ds[0]
    assert s["masks"].shape == (1, 30, 40)
    assert s["masks"][0, 7, 7] == 1 and s["masks"][0, 20, 30] == 0


def test_coco_keypoints(coco_dir):
    img_dir, ann_file = coco_dir
    ds = D.CocoDataset(img_dir, ann_file, task="keypoints")
    s = ds[0]
    np.testing.assert_allclose(s["keypoints"][0, 0], [4, 5])
    assert s["keypoint_visible"][0].tolist() == [True, False]


def test_coco_detection_end_to_end_batch(coco_dir):
    img_dir, ann_file = coco_dir
    ds = D.CocoDataset(img_dir, ann_file, task="boxes")
    it = D.batched_loader(
        ds, 2, D.collate_detection(max_targets=5),
        augment=A.train_pipeline(16, seed=0), shuffle=False, epochs=1,
    )
    x, t = next(iter(it))
    assert x.shape == (2, 16, 16, 3)
    assert t["classes"].shape == (2, 5) and t["boxes"].shape == (2, 5, 4)
    assert (t["classes"] >= -1).all()


def test_segmentation_folder(tmp_path):
    from PIL import Image

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    _write_img(tmp_path / "images" / "a.png", h=10, w=10)
    Image.fromarray(np.full((10, 10), 3, np.uint8)).save(tmp_path / "masks" / "a.png")
    ds = D.SegmentationFolderDataset(tmp_path)
    s = ds[0]
    assert s["dense_map"].shape == (10, 10) and (s["dense_map"] == 3).all()

"""COCO evaluator hardening: differential test against a spec-literal
oracle (reference_coco_eval) on adversarial fixtures, plus a matrix of
hand-computed cases (VERDICT round-1 item 6: one scalar is not parity for
a 101-point, 10-threshold, 4-area-range, 3-maxdet protocol)."""

import numpy as np
import pytest

from sihl_tpu.utils.coco_map import MeanAveragePrecisionAccumulator

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from reference_coco_eval import evaluate as oracle_evaluate

KEYS = ["map", "map_50", "map_75", "map_small", "map_medium", "map_large",
        "mar_1", "mar_10", "mar_100"]


def _run_accumulator(images, iou_type="bbox"):
    """Feed unpadded per-image fixtures through the padded-batch API."""
    acc = MeanAveragePrecisionAccumulator(iou_type=iou_type)
    for im in images:
        if iou_type == "bbox":
            p = im["det_geoms"].reshape(1, -1, 4)
            g_shape = (1, max(len(im["gt_geoms"]), 1), 4)
            g = np.zeros(g_shape, np.float32)
        else:
            hw = (
                im["det_geoms"].shape[1:]
                if im["det_geoms"].ndim == 3
                else im["gt_geoms"].shape[1:]
            )
            p = im["det_geoms"].reshape((1, -1) + hw)
            g = np.zeros((1, max(len(im["gt_geoms"]), 1)) + hw, np.float32)
        gc = np.full((1, g.shape[1]), -1, np.int32)
        if len(im["gt_geoms"]):
            g[0, : len(im["gt_geoms"])] = im["gt_geoms"]
            gc[0, : len(im["gt_classes"])] = im["gt_classes"]
        acc.update(
            p,
            im["det_classes"].reshape(1, -1),
            im["det_scores"].reshape(1, -1),
            g,
            gc,
        )
    return acc.compute()


def _random_images(seed, n_images=25, n_classes=4, segm=False, tie_scores=False):
    rng = np.random.RandomState(seed)
    images = []
    for i in range(n_images):
        n_gt = rng.randint(0, 6)      # includes empty-gt images
        n_det = rng.randint(0, 8)     # includes no-detection images
        if segm:
            def geoms(n):
                m = np.zeros((n, 16, 16), np.float32)
                for k in range(n):
                    y, x = rng.randint(0, 10, 2)
                    hgt, wid = rng.randint(2, 7, 2)
                    m[k, y : y + hgt, x : x + wid] = 1
                return m
            gt_geoms, det_geoms = geoms(n_gt), geoms(n_det)
        else:
            def geoms(n):
                # wide size spread crosses the 32^2 / 96^2 area boundaries
                xy = rng.rand(n, 2) * 200
                wh = rng.choice([4, 20, 40, 100, 150], (n, 2)) * rng.uniform(
                    0.8, 1.2, (n, 2)
                )
                return np.concatenate([xy, xy + wh], 1).astype(np.float32)
            gt_geoms, det_geoms = geoms(n_gt), geoms(n_det)
            # half the detections are jittered copies of gts (plausible TPs)
            for k in range(min(n_det, n_gt)):
                if rng.rand() < 0.6:
                    det_geoms[k] = gt_geoms[k] + rng.randn(4) * 6
        scores = rng.rand(n_det).astype(np.float32)
        if tie_scores and n_det:
            scores = np.round(scores * 4) / 4  # heavy score ties
        images.append(
            {
                "gt_geoms": gt_geoms,
                "gt_classes": rng.randint(0, n_classes, n_gt),
                "det_geoms": det_geoms,
                "det_classes": rng.randint(0, n_classes, n_det),
                "det_scores": scores,
            }
        )
    return images


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_differential_bbox(seed):
    images = _random_images(seed)
    got = _run_accumulator(images)
    want = oracle_evaluate(images)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-6), (k, got[k], want[k])


def test_differential_bbox_score_ties():
    images = _random_images(7, tie_scores=True)
    got = _run_accumulator(images)
    want = oracle_evaluate(images)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-6), (k, got[k], want[k])


@pytest.mark.parametrize("seed", [10, 11])
def test_differential_segm(seed):
    images = _random_images(seed, segm=True)
    got = _run_accumulator(images, iou_type="segm")
    want = oracle_evaluate(images, iou_type="segm")
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-6), (k, got[k], want[k])


# -- hand-computed matrix ----------------------------------------------------


def _img(gt, gt_cls, det, det_cls, scores):
    return {
        "gt_geoms": np.asarray(gt, np.float32).reshape(-1, 4),
        "gt_classes": np.asarray(gt_cls, np.int32),
        "det_geoms": np.asarray(det, np.float32).reshape(-1, 4),
        "det_classes": np.asarray(det_cls, np.int32),
        "det_scores": np.asarray(scores, np.float32),
    }


def test_perfect_detection():
    images = [_img([[0, 0, 50, 50]], [0], [[0, 0, 50, 50]], [0], [0.9])]
    got = _run_accumulator(images)
    assert got["map"] == pytest.approx(1.0)
    assert got["mar_1"] == pytest.approx(1.0)


def test_iou_toggles_across_thresholds():
    # det [0,0,60,100] vs gt [0,0,100,100]: IoU = 6000/10000 = 0.6 exactly
    # -> TP at thr 0.50, 0.55, 0.60 only => map = 3/10
    images = [_img([[0, 0, 100, 100]], [0], [[0, 0, 60, 100]], [0], [0.9])]
    got = _run_accumulator(images)
    assert got["map"] == pytest.approx(0.3)
    assert got["map_50"] == pytest.approx(1.0)
    assert got["map_75"] == pytest.approx(0.0)


def test_fp_after_tp_does_not_lower_interpolated_ap():
    # recall 1.0 is reached at the first (higher-scored) det with
    # precision 1.0; the later FP cannot reduce 101-point AP
    images = [
        _img(
            [[0, 0, 50, 50]], [0],
            [[0, 0, 50, 50], [200, 200, 240, 240]], [0, 0], [0.9, 0.8],
        )
    ]
    got = _run_accumulator(images)
    assert got["map"] == pytest.approx(1.0)


def test_fp_before_tp_halves_precision():
    # FP scored above the TP: at recall 1.0 precision is 1/2 for every
    # recall point => AP = (1 pt at r=0 .. all 101 pts at p=0.5) = 0.5
    images = [
        _img(
            [[0, 0, 50, 50]], [0],
            [[200, 200, 240, 240], [0, 0, 50, 50]], [0, 0], [0.9, 0.8],
        )
    ]
    got = _run_accumulator(images)
    assert got["map"] == pytest.approx(0.5)


def test_one_of_two_gts_found():
    # 1 TP of 2 gts, no FPs: precision 1.0 up to recall 0.5, 0 beyond
    # => AP = 51/101 per threshold
    images = [
        _img(
            [[0, 0, 50, 50], [100, 100, 150, 150]], [0, 0],
            [[0, 0, 50, 50]], [0], [0.9],
        )
    ]
    got = _run_accumulator(images)
    assert got["map"] == pytest.approx(51 / 101)
    assert got["mar_100"] == pytest.approx(0.5)


def test_empty_gt_image_contributes_fps_only():
    images = [
        _img([[0, 0, 50, 50]], [0], [[0, 0, 50, 50]], [0], [0.9]),
        _img(np.zeros((0, 4)), [], [[10, 10, 60, 60]], [0], [0.95]),
    ]
    got = _run_accumulator(images)
    # FP outscores the TP: precision at recall 1.0 is 0.5
    assert got["map"] == pytest.approx(0.5)


def test_class_confusion_is_fp():
    images = [_img([[0, 0, 50, 50]], [1], [[0, 0, 50, 50]], [0], [0.9])]
    got = _run_accumulator(images)
    assert got["map"] == pytest.approx(0.0)


def test_per_class_mean():
    # class 0 perfect, class 1 missed entirely -> mean 0.5
    images = [
        _img(
            [[0, 0, 50, 50], [100, 100, 150, 150]], [0, 1],
            [[0, 0, 50, 50]], [0], [0.9],
        )
    ]
    got = _run_accumulator(images)
    assert got["map"] == pytest.approx(0.5)


def test_area_range_membership():
    # gt area 30x30=900 < 32^2 (small); 60x60=3600 (medium); 100x100 (large)
    images = [
        _img(
            [[0, 0, 30, 30], [0, 0, 60, 60], [0, 0, 100, 100]]
            if False
            else [[0, 0, 30, 30]],
            [0],
            [[0, 0, 30, 30]],
            [0],
            [0.9],
        ),
        _img([[200, 200, 300, 300]], [0], np.zeros((0, 4)), [], []),
    ]
    got = _run_accumulator(images)
    assert got["map_small"] == pytest.approx(1.0)   # the small gt is found
    assert got["map_large"] == pytest.approx(0.0)   # the large gt is missed
    assert got["map_medium"] == -1.0                # no medium gt anywhere
    # "all": 1 of 2 gts found, precision 1.0 -> 51 of 101 recall points
    assert got["map"] == pytest.approx(51 / 101)


def test_mar_maxdets_truncation():
    # 11 dets: rank 1-10 are FPs, rank 11 is the TP
    # mar_10 sees only the top 10 per image -> 0; mar_100 -> 1
    gt = [[0, 0, 50, 50]]
    dets = [[200 + 10 * i, 200, 240 + 10 * i, 240] for i in range(10)] + [
        [0, 0, 50, 50]
    ]
    scores = [0.9 - 0.01 * i for i in range(10)] + [0.5]
    images = [_img(gt, [0], dets, [0] * 11, scores)]
    got = _run_accumulator(images)
    assert got["mar_10"] == pytest.approx(0.0)
    assert got["mar_100"] == pytest.approx(1.0)


def test_segm_hand_case():
    m_gt = np.zeros((1, 8, 8), np.float32)
    m_gt[0, :4, :4] = 1  # 16 px
    m_det = np.zeros((1, 8, 8), np.float32)
    m_det[0, :4, :2] = 1  # 8 px, all inside gt -> IoU 8/16 = 0.5
    images = [
        {
            "gt_geoms": m_gt,
            "gt_classes": np.array([0]),
            "det_geoms": m_det,
            "det_classes": np.array([0]),
            "det_scores": np.array([0.9], np.float32),
        }
    ]
    got = _run_accumulator(images, iou_type="segm")
    # IoU exactly 0.5 -> TP only at thr 0.50 => map = 1/10
    assert got["map"] == pytest.approx(0.1)
    assert got["map_50"] == pytest.approx(1.0)

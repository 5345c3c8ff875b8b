"""Object detection head quartet (mirrors reference
``tests/heads/test_object_detection.py``), with padded targets and an
empty-target image (image 0 has 0 objects, like the reference :41-51)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import ObjectDetection

from conftest import make_pyramid

BATCH = 2
NUM_CLASSES = 5
MAX_TARGETS = 10


def make_head_and_data(**kw):
    pyramid = [jnp.asarray(x) for x in make_pyramid(batch_size=BATCH)]
    head = ObjectDetection(
        [x.shape[-1] for x in pyramid],
        NUM_CLASSES,
        num_channels=16,
        num_layers=2,
        max_instances=20,
        max_targets=MAX_TARGETS,
        rngs=nnx.Rngs(0),
        **kw,
    )
    rng = np.random.RandomState(0)
    classes = np.full((BATCH, MAX_TARGETS), -1, np.int32)
    boxes = np.zeros((BATCH, MAX_TARGETS, 4), np.float32)
    # image 0: empty; image 1: 4 objects
    n = 4
    classes[1, :n] = rng.randint(0, NUM_CLASSES, n)
    xy = rng.rand(n, 2) * 32
    wh = rng.rand(n, 2) * 30 + 2
    boxes[1, :n] = np.concatenate([xy, xy + wh], axis=1)
    return head, pyramid, jnp.asarray(classes), jnp.asarray(boxes)


def test_forward_shapes():
    head, pyramid, _, _ = make_head_and_data()
    head.eval()
    num_instances, scores, classes, boxes = head(pyramid)
    assert num_instances.shape == (BATCH,)
    assert scores.shape == (BATCH, 20)
    assert classes.shape == (BATCH, 20)
    assert boxes.shape == (BATCH, 20, 4)
    # scores sorted descending (topk property)
    assert np.all(np.diff(np.asarray(scores), axis=1) <= 1e-6)


def test_forward_jit_parity():
    head, pyramid, _, _ = make_head_and_data()
    head.eval()
    graphdef, state = nnx.split(head)

    @jax.jit
    def run(state, inputs):
        return nnx.merge(graphdef, state)(inputs)

    eager = head(pyramid)
    jitted = run(state, pyramid)
    for a, b in zip(eager, jitted):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_training_step():
    head, pyramid, classes, boxes = make_head_and_data()
    head.train()
    loss, metrics = head.training_step(pyramid, classes, boxes)
    assert np.isfinite(float(loss))
    assert set(metrics) == {"location_loss", "box_loss", "class_loss", "iou_loss"}
    for v in metrics.values():
        assert np.isfinite(float(v))


def test_training_step_all_empty():
    head, pyramid, classes, boxes = make_head_and_data()
    head.train()
    empty_classes = jnp.full_like(classes, -1)
    loss, metrics = head.training_step(pyramid, empty_classes, jnp.zeros_like(boxes))
    assert np.isfinite(float(loss))
    assert float(metrics["box_loss"]) == 0.0
    assert float(metrics["class_loss"]) == 0.0


def test_training_jits():
    head, pyramid, classes, boxes = make_head_and_data()
    head.train()
    graphdef, state = nnx.split(head)

    @jax.jit
    def run(state, inputs, classes, boxes):
        h = nnx.merge(graphdef, state)
        return h.training_step(inputs, classes, boxes)[0]

    loss = run(state, pyramid, classes, boxes)
    assert np.isfinite(float(loss))


def test_validation():
    head, pyramid, classes, boxes = make_head_and_data()
    head.eval()
    state = head.metrics_init()
    collected = []
    state, loss, aux = head.validation_step(state, pyramid, classes, boxes)
    collected.append(jax.device_get(aux))
    metrics = head.validation_end(state, collected)
    assert "loss" in metrics and "map" in metrics
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["map"] <= 1.0


def test_saliency():
    head, pyramid, _, _ = make_head_and_data()
    head.eval()
    sal = head.get_saliency(pyramid)
    assert sal.shape == (BATCH, pyramid[3].shape[1], pyramid[3].shape[2])
    assert np.all(np.asarray(sal) >= 0) and np.all(np.asarray(sal) <= 1)


def test_map_perfect_detection():
    """Sanity for the host-side COCO evaluator: perfect preds -> mAP 1."""
    from sihl_tpu.utils.coco_map import MeanAveragePrecisionAccumulator

    acc = MeanAveragePrecisionAccumulator()
    gt_boxes = np.array([[[10, 10, 50, 50], [60, 60, 90, 90]]], np.float32)
    gt_classes = np.array([[0, 1]])
    pred_boxes = np.concatenate([gt_boxes, np.zeros((1, 3, 4), np.float32)], axis=1)
    pred_classes = np.array([[0, 1, 0, 0, 0]])
    scores = np.array([[0.9, 0.8, 0.01, 0.01, 0.01]], np.float32)
    acc.update(pred_boxes, pred_classes, scores, gt_boxes, gt_classes)
    out = acc.compute()
    assert np.isclose(out["map_50"], 1.0, atol=0.02), out
    assert out["map"] > 0.9, out


def test_map_wrong_detection():
    from sihl_tpu.utils.coco_map import MeanAveragePrecisionAccumulator

    acc = MeanAveragePrecisionAccumulator()
    gt_boxes = np.array([[[10, 10, 50, 50]]], np.float32)
    gt_classes = np.array([[0]])
    pred_boxes = np.array([[[200, 200, 250, 250]]], np.float32)
    pred_classes = np.array([[0]])
    scores = np.array([[0.9]], np.float32)
    acc.update(pred_boxes, pred_classes, scores, gt_boxes, gt_classes)
    out = acc.compute()
    assert out["map"] < 0.01, out


def test_map_hand_computed_case():
    """Exactness check against a hand-derived AP value.

    One class, two gt boxes in one image. Detections: rank-1 TP (IoU=1),
    rank-2 FP (IoU=0).  PR points: (p=1, r=0.5) then (p=0.5, r=0.5).
    101-pt interpolated AP at every threshold t<=0.95... precision
    envelope = 1.0 for recall <= 0.5, 0 beyond -> AP = 51/101.
    """
    from sihl_tpu.utils.coco_map import MeanAveragePrecisionAccumulator

    acc = MeanAveragePrecisionAccumulator()
    gt_boxes = np.array([[[0, 0, 100, 100], [200, 200, 300, 300]]], np.float32)
    gt_classes = np.array([[0, 0]])
    pred_boxes = np.array([[[0, 0, 100, 100], [400, 400, 450, 450]]], np.float32)
    pred_classes = np.array([[0, 0]])
    scores = np.array([[0.9, 0.8]], np.float32)
    acc.update(pred_boxes, pred_classes, scores, gt_boxes, gt_classes)
    out = acc.compute()
    expected_ap = 51 / 101  # recall points 0.00..0.50 at precision 1.0
    assert np.isclose(out["map_50"], expected_ap, atol=1e-6), out["map_50"]
    assert np.isclose(out["map"], expected_ap, atol=1e-6), out["map"]
    assert np.isclose(out["mar_10"], 0.5, atol=1e-6)

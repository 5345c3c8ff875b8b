"""Tests for instance segmentation, keypoint detection, quadrilateral
detection, and anomaly detection heads."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import (
    InstanceSegmentation,
    KeypointDetection,
    QuadrilateralDetection,
    AnomalyDetection,
)

from conftest import make_pyramid

BATCH = 2
H = W = 64
T = 5  # max targets


def pyramid():
    return [jnp.asarray(x) for x in make_pyramid(batch_size=BATCH, height=H, width=W)]


class TestInstanceSegmentation:
    def make(self):
        inputs = pyramid()
        head = InstanceSegmentation(
            [x.shape[-1] for x in inputs], num_classes=4, num_channels=16,
            num_layers=1, max_instances=8, max_targets=T, max_mask_positives=16,
            rngs=nnx.Rngs(0),
        )
        rng = np.random.RandomState(0)
        classes = np.full((BATCH, T), -1, np.int32)
        masks = np.zeros((BATCH, T, 32, 32), np.float32)
        # image 0 empty, image 1 has 3 instances
        for t in range(3):
            classes[1, t] = rng.randint(0, 4)
            y, x = rng.randint(0, 24, 2)
            masks[1, t, y : y + 8, x : x + 8] = 1.0
        return head, inputs, jnp.asarray(classes), jnp.asarray(masks)

    def test_forward(self):
        head, inputs, _, _ = self.make()
        head.eval()
        num, scores, classes, masks = head(inputs)
        assert num.shape == (BATCH,)
        assert scores.shape == (BATCH, 8)
        assert masks.shape == (BATCH, 8, H // 8, W // 8)
        m = np.asarray(masks)
        assert (m >= 0).all() and (m <= 1).all()

    def test_training_step(self):
        head, inputs, classes, masks = self.make()
        head.train()
        loss, metrics = head.training_step(inputs, classes, masks)
        assert np.isfinite(float(loss))
        assert set(metrics) == {"location_loss", "mask_loss", "class_loss"}

    def test_training_empty(self):
        head, inputs, classes, masks = self.make()
        head.train()
        loss, metrics = head.training_step(
            inputs, jnp.full_like(classes, -1), jnp.zeros_like(masks)
        )
        assert np.isfinite(float(loss))
        assert float(metrics["mask_loss"]) == 0.0

    def test_validation(self):
        head, inputs, classes, masks = self.make()
        head.eval()
        state = head.metrics_init()
        state, loss, aux = head.validation_step(state, inputs, classes, masks)
        metrics = head.validation_end(state, [jax.device_get(aux)])
        assert "loss" in metrics and "map" in metrics


class TestKeypointDetection:
    def make(self):
        inputs = pyramid()
        head = KeypointDetection(
            [x.shape[-1] for x in inputs], num_keypoints=5, num_channels=16,
            num_layers=1, max_instances=8, max_targets=T, max_mask_positives=16,
            bottom_level=4, top_level=5, rngs=nnx.Rngs(0),
        )
        rng = np.random.RandomState(0)
        keypoints = np.zeros((BATCH, T, 5, 2), np.float32)
        presence = np.zeros((BATCH, T, 5), bool)
        for t in range(2):
            keypoints[1, t] = rng.rand(5, 2) * 48 + 8
            presence[1, t] = rng.rand(5) > 0.3
        presence[1, 0, 0] = True  # at least one visible
        return head, inputs, jnp.asarray(keypoints), jnp.asarray(presence)

    def test_forward(self):
        head, inputs, _, _ = self.make()
        head.eval()
        num, scores, presence, keypoints = head(inputs)
        assert presence.shape == (BATCH, 8, 5)
        assert keypoints.shape == (BATCH, 8, 5, 2)
        k = np.asarray(keypoints)
        assert (k >= 0).all() and (k[..., 0] <= W).all() and (k[..., 1] <= H).all()

    def test_training_step(self):
        head, inputs, keypoints, presence = self.make()
        head.train()
        loss, metrics = head.training_step(inputs, keypoints, presence)
        assert np.isfinite(float(loss))
        assert set(metrics) == {"location_loss", "keypoint_loss", "presence_loss"}

    def test_validation(self):
        head, inputs, keypoints, presence = self.make()
        head.eval()
        state = head.metrics_init()
        state, loss, aux = head.validation_step(state, inputs, keypoints, presence)
        metrics = head.validation_end(state, [jax.device_get(aux)])
        assert "PCK" in metrics and "loss" in metrics
        assert 0 <= metrics["PCK"] <= 1

    def test_keypoints_to_boxes(self):
        kpts = jnp.asarray([[[1.0, 2.0], [3.0, 8.0], [5.0, 4.0]]])
        pres = jnp.asarray([[True, True, False]])
        boxes = KeypointDetection.keypoints_to_boxes(kpts, pres)
        np.testing.assert_allclose(np.asarray(boxes)[0], [1, 2, 3, 8])


class TestQuadrilateralDetection:
    def make(self):
        inputs = pyramid()
        head = QuadrilateralDetection(
            [x.shape[-1] for x in inputs], num_classes=3, num_channels=16,
            num_layers=1, max_instances=8, max_targets=T, rngs=nnx.Rngs(0),
        )
        rng = np.random.RandomState(0)
        classes = np.full((BATCH, T), -1, np.int32)
        quads = np.zeros((BATCH, T, 4, 2), np.float32)
        for t in range(2):
            classes[1, t] = rng.randint(0, 3)
            cx, cy = rng.rand(2) * 32 + 16
            quads[1, t] = [
                [cx - 8, cy - 8], [cx + 8, cy - 8], [cx + 8, cy + 8], [cx - 8, cy + 8],
            ]
        return head, inputs, jnp.asarray(classes), jnp.asarray(quads)

    def test_forward(self):
        head, inputs, _, _ = self.make()
        head.eval()
        num, scores, classes, quads = head(inputs)
        assert quads.shape == (BATCH, 8, 4, 2)

    def test_training_step(self):
        head, inputs, classes, quads = self.make()
        head.train()
        loss, metrics = head.training_step(inputs, classes, quads)
        assert np.isfinite(float(loss))
        assert set(metrics) == {"location_loss", "quad_loss", "class_loss"}

    def test_training_empty(self):
        head, inputs, classes, quads = self.make()
        head.train()
        loss, metrics = head.training_step(
            inputs, jnp.full_like(classes, -1), jnp.zeros_like(quads)
        )
        assert np.isfinite(float(loss))

    def test_validation(self):
        head, inputs, classes, quads = self.make()
        head.eval()
        state = head.metrics_init()
        state, loss, aux = head.validation_step(state, inputs, classes, quads)
        metrics = head.validation_end(state, [jax.device_get(aux)])
        assert "map" in metrics

    def test_canonicalize(self):
        # convex square in arbitrary vertex order -> angle-sorted, unchanged set
        quad = jnp.asarray([[[1.0, 0.0], [0.0, 0.0], [1.0, 1.0], [0.0, 1.0]]])
        fixed = np.asarray(QuadrilateralDetection.canonicalize_and_convexify(quad))[0]
        assert {tuple(v) for v in fixed.tolist()} == {
            (0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0),
        }


class TestAnomalyDetection:
    def make(self):
        inputs = pyramid()
        head = AnomalyDetection(
            [x.shape[-1] for x in inputs], level=2, num_channels=8,
            autoencoder_channels=8, reservoir_size=256, samples_per_step=32,
            rngs=nnx.Rngs(0),
        )
        return head, inputs

    def test_forward(self):
        head, inputs = self.make()
        head.eval()
        anomaly = head(inputs)
        assert anomaly.shape == (BATCH, H, W)
        a = np.asarray(anomaly)
        assert (a >= 0).all() and (a <= 1).all()

    def test_training_and_calibration(self):
        head, inputs = self.make()
        head.train()
        loss, metrics = head.training_step(inputs)
        assert np.isfinite(float(loss))
        assert int(head.reservoir_filled[...]) == 32
        head.training_step(inputs)
        assert int(head.reservoir_filled[...]) == 64
        head.on_validation_start()
        assert float(head.q_st_end[...]) >= float(head.q_st_start[...])

    def test_pretraining_protocol(self):
        head, inputs = self.make()
        head.eval()
        state = head.pretrain_init()
        state = head.pretrain_step(state, inputs)
        state = head.pretrain_step(state, inputs)
        head.pretrain_end(state)
        mean = np.asarray(head.features_mean[...])
        expected = np.asarray(inputs[2]).reshape(-1, inputs[2].shape[-1]).mean(0)
        np.testing.assert_allclose(mean.reshape(-1), expected, atol=1e-4)

    def test_validation(self):
        head, inputs = self.make()
        head.eval()
        state = head.metrics_init()
        targets = jnp.zeros((BATCH, H, W))
        state, loss, _ = head.validation_step(state, inputs, targets)
        metrics = head.validation_end(state)
        assert set(metrics) == {"loss", "mean_iou", "accuracy"}

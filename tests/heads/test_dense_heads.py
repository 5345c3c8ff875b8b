"""Quartet tests for semantic segmentation, depth estimation, and
autoencoding heads."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import SemanticSegmentation, DepthEstimation, Autoencoding

from conftest import make_pyramid

BATCH = 2
H = W = 64
NUM_CLASSES = 6


def pyramid():
    return [jnp.asarray(x) for x in make_pyramid(batch_size=BATCH, height=H, width=W)]


class TestSemanticSegmentation:
    def make(self):
        inputs = pyramid()
        head = SemanticSegmentation(
            [x.shape[-1] for x in inputs], NUM_CLASSES, num_channels=16,
            num_layers=1, ignore_index=-1, rngs=nnx.Rngs(0),
        )
        rng = np.random.RandomState(0)
        targets = rng.randint(0, NUM_CLASSES, (BATCH, H, W))
        targets[0, :4] = -1  # ignored region
        return head, inputs, jnp.asarray(targets)

    def test_forward(self):
        head, inputs, _ = self.make()
        head.eval()
        scores, classes = head(inputs)
        assert scores.shape == (BATCH, H, W)
        assert classes.shape == (BATCH, H, W)
        assert np.asarray(classes).max() < NUM_CLASSES

    def test_training_step(self):
        head, inputs, targets = self.make()
        head.train()
        loss, _ = head.training_step(inputs, targets)
        assert np.isfinite(float(loss))

    def test_validation(self):
        head, inputs, targets = self.make()
        head.eval()
        state = head.metrics_init()
        state, loss, _ = head.validation_step(state, inputs, targets)
        metrics = head.validation_end(state)
        assert set(metrics) == {"loss", "pixel_accuracy", "mean_iou"}
        assert 0 <= metrics["mean_iou"] <= 1


class TestDepthEstimation:
    def make(self):
        inputs = pyramid()
        head = DepthEstimation(
            [x.shape[-1] for x in inputs], lower_bound=0.1, upper_bound=10.0,
            num_channels=16, num_bins=8, rngs=nnx.Rngs(0),
        )
        rng = np.random.RandomState(0)
        targets = rng.rand(BATCH, H, W).astype(np.float32) * 9.9 + 0.1
        masks = rng.rand(BATCH, H, W) > 0.3
        return head, inputs, jnp.asarray(targets), jnp.asarray(masks)

    def test_forward(self):
        head, inputs, _, _ = self.make()
        head.eval()
        depth = head(inputs)
        assert depth.shape == (BATCH, H, W)
        d = np.asarray(depth)
        assert (d >= 0.1 - 1e-5).all() and (d <= 10.0 + 1e-5).all()

    def test_training_step(self):
        head, inputs, targets, masks = self.make()
        head.train()
        loss, metrics = head.training_step(inputs, targets, masks)
        assert np.isfinite(float(loss))
        assert set(metrics) == {"pixel_loss", "hist_loss"}

    def test_validation(self):
        head, inputs, targets, masks = self.make()
        head.eval()
        state = head.metrics_init()
        state, _, _ = head.validation_step(state, inputs, targets, masks)
        metrics = head.validation_end(state)
        assert set(metrics) == {"loss", "rmse", "mae"}
        assert np.isfinite(metrics["rmse"])


class TestAutoencoding:
    def make(self):
        inputs = pyramid()
        head = Autoencoding(
            [x.shape[-1] for x in inputs], num_channels=8,
            representation_channels=32, rngs=nnx.Rngs(0),
        )
        return head, inputs

    def test_forward(self):
        head, inputs = self.make()
        head.eval()
        recon, repr_ = head(inputs)
        assert recon.shape == (BATCH, H, W, 3)
        assert repr_.shape == (BATCH, 32)
        r = np.asarray(recon)
        assert (r >= 0).all() and (r <= 1).all()  # sigmoid output

    def test_training_step(self):
        head, inputs = self.make()
        head.train()
        loss, _ = head.training_step(inputs, inputs[0])
        assert np.isfinite(float(loss))

    def test_validation(self):
        head, inputs = self.make()
        head.eval()
        state = head.metrics_init()
        state, _, _ = head.validation_step(state, inputs, inputs[0])
        metrics = head.validation_end(state)
        assert set(metrics) == {"loss", "mean_absolute_error", "mean_squared_error"}


def test_depth_masked_invalid_pixels_no_nan():
    """Zero-depth (invalid) pixels must not poison the masked losses —
    the reference boolean-indexes valid pixels and never sees them."""
    import numpy as np

    from sihl_tpu.heads import DepthEstimation

    rngs = nnx.Rngs(0)
    head = DepthEstimation(
        [3, 8, 16, 16, 16, 16], lower_bound=0.1, upper_bound=10.0, rngs=rngs
    )
    feats = [jnp.zeros((2, 32, 32, 3))] + [
        jnp.asarray(np.random.RandomState(0).rand(2, 32 >> l, 32 >> l, c), jnp.float32)
        for l, c in [(1, 8), (2, 16), (3, 16), (4, 16), (5, 16)]
    ]
    targets = np.random.RandomState(1).rand(2, 32, 32).astype(np.float32) * 5
    masks = np.random.RandomState(2).rand(2, 32, 32) > 0.3
    targets[~masks] = 0.0  # invalid pixels hold 0 (NYU-style)
    loss, metrics = head.training_step(
        feats, jnp.asarray(targets), jnp.asarray(masks)
    )
    assert np.isfinite(float(loss)), float(loss)

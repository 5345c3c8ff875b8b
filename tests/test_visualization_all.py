"""Render smoke test for every remaining head type's visualization."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import (
    AnomalyDetection,
    Autoencoding,
    DepthEstimation,
    InstanceSegmentation,
    KeypointDetection,
    MetricLearning,
    MultilabelClassification,
    PanopticSegmentation,
    QuadrilateralDetection,
    Regression,
    ViewInvarianceLearning,
)
from sihl_tpu.visualization import get_images

from conftest import make_pyramid

BATCH = 1
H = W = 64


def pyramid(seed=0):
    return [
        jnp.asarray(x)
        for x in make_pyramid(batch_size=BATCH, height=H, width=W,
                              rng=np.random.RandomState(seed))
    ]


def check(head, config, target, inputs=None):
    inputs = inputs or pyramid()
    head.eval()
    images = get_images(head, config, inputs[0], target, inputs)
    assert len(images) >= 1
    for img in images:
        assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[0] == 3


def test_all_remaining_heads_render():
    rng = np.random.RandomState(0)
    inputs = pyramid()
    channels = [x.shape[-1] for x in inputs]
    rngs = nnx.Rngs(0)

    check(
        MultilabelClassification(channels, 4, num_channels=8, rngs=rngs),
        {}, jnp.asarray(rng.rand(BATCH, 4) > 0.5), inputs,
    )
    check(Regression(channels, 0.0, 1.0, num_channels=8, rngs=rngs),
          {}, jnp.asarray([0.4]), inputs)
    check(
        QuadrilateralDetection(channels, 2, num_channels=16, num_layers=1,
                               max_instances=5, max_targets=3, rngs=rngs),
        {},
        {
            "classes": jnp.asarray([[0, -1, -1]]),
            "quads": jnp.asarray(np.zeros((1, 3, 4, 2), np.float32)),
        },
        inputs,
    )
    check(
        InstanceSegmentation(channels, 2, num_channels=16, num_layers=1,
                             max_instances=5, max_targets=3,
                             max_mask_positives=8, rngs=rngs),
        {},
        {
            "classes": jnp.asarray([[0, -1, -1]]),
            "masks": jnp.asarray(np.ones((1, 3, 16, 16), np.float32)),
        },
        inputs,
    )
    check(
        KeypointDetection(channels, 4, num_channels=16, num_layers=1,
                          max_instances=5, max_targets=3,
                          max_mask_positives=8, rngs=rngs),
        {},
        {
            "keypoints": jnp.asarray(rng.rand(1, 3, 4, 2).astype(np.float32) * 60),
            "presence": jnp.asarray(np.ones((1, 3, 4), bool)),
        },
        inputs,
    )
    check(
        PanopticSegmentation(channels, 2, 2, num_channels=16, num_layers=2,
                             max_instances=5, max_targets=3, rngs=rngs),
        {},
        {
            "semantic": jnp.asarray(rng.randint(0, 4, (1, H, W))),
            "classes": jnp.asarray([[0, -1, -1]]),
            "masks": jnp.asarray(np.ones((1, 3, 16, 16), np.float32)),
        },
        inputs,
    )
    check(
        DepthEstimation(channels, 0.1, 10.0, num_channels=8, num_bins=4, rngs=rngs),
        {},
        {
            "targets": jnp.asarray(rng.rand(1, H, W).astype(np.float32) * 9 + 0.1),
            "masks": jnp.asarray(np.ones((1, H, W), bool)),
        },
        inputs,
    )
    check(Autoencoding(channels, num_channels=8, representation_channels=16, rngs=rngs),
          {}, inputs[0], inputs)
    check(
        AnomalyDetection(channels, level=2, num_channels=8, autoencoder_channels=8,
                         reservoir_size=64, samples_per_step=16, rngs=rngs),
        {}, jnp.zeros((1, H, W)), inputs,
    )
    check(MetricLearning(channels, 4, embedding_dim=16, rngs=rngs),
          {}, jnp.asarray([1]), inputs)
    check(ViewInvarianceLearning(channels, embedding_dim=16, num_channels=8,
                                 num_layers=1, rngs=rngs),
          {}, pyramid(1), inputs)

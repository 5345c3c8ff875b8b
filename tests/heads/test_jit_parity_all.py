"""jit-vs-eager forward parity for EVERY head type — the analog of the
reference's per-head ONNX-parity tests (``tests/heads/*:test_onnx_*``):
the jitted program (our export path) must reproduce the eager outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from sihl_tpu import heads as H

from conftest import make_pyramid

BATCH = 2


def pyramid():
    return [jnp.asarray(x) for x in make_pyramid(batch_size=BATCH)]


def _build(name, channels, rngs):
    k = dict(rngs=rngs)
    small = dict(num_channels=16, num_layers=1)
    det = dict(max_instances=6, max_targets=4, **small)
    builders = {
        "multiclass": lambda: H.MulticlassClassification(channels, 4, num_channels=16, rngs=rngs),
        "multilabel": lambda: H.MultilabelClassification(channels, 4, num_channels=16, rngs=rngs),
        "regression": lambda: H.Regression(channels, 0.0, 1.0, num_channels=16, rngs=rngs),
        "detection": lambda: H.ObjectDetection(channels, 3, **det, **k),
        "instance": lambda: H.InstanceSegmentation(channels, 3, max_mask_positives=8, **det, **k),
        "keypoint": lambda: H.KeypointDetection(channels, 4, max_mask_positives=8, **det, **k),
        "quad": lambda: H.QuadrilateralDetection(channels, 3, **det, **k),
        "semantic": lambda: H.SemanticSegmentation(channels, 4, **small, **k),
        "depth": lambda: H.DepthEstimation(channels, 0.1, 10.0, num_bins=4, num_channels=16, **k),
        "panoptic": lambda: H.PanopticSegmentation(
            channels, 2, 2, num_channels=16, num_layers=2, max_instances=6,
            max_targets=4, **k,
        ),
        "text": lambda: H.TextRecognition(channels, 9, 5, num_channels=16, embedding_dim=32, **k),
        "metric": lambda: H.MetricLearning(channels, 4, embedding_dim=16, **k),
        "anomaly": lambda: H.AnomalyDetection(
            channels, level=2, num_channels=8, autoencoder_channels=8,
            reservoir_size=64, samples_per_step=16, **k,
        ),
        "autoencoding": lambda: H.Autoencoding(
            channels, num_channels=8, representation_channels=16, **k
        ),
        "view_invariance": lambda: H.ViewInvarianceLearning(
            channels, embedding_dim=16, num_channels=8, num_layers=1, **k
        ),
    }
    return builders[name]()


ALL_HEADS = [
    "multiclass", "multilabel", "regression", "detection", "instance",
    "keypoint", "quad", "semantic", "depth", "panoptic", "text", "metric",
    "anomaly", "autoencoding", "view_invariance",
]


@pytest.mark.parametrize("name", ALL_HEADS)
def test_jit_forward_parity(name):
    inputs = pyramid()
    channels = [x.shape[-1] for x in inputs]
    head = _build(name, channels, nnx.Rngs(0))
    head.eval()
    eager = head(inputs)
    graphdef, state = nnx.split(head)

    @jax.jit
    def run(state, inputs):
        return nnx.merge(graphdef, state)(inputs)

    jitted = run(state, inputs)
    for a, b in zip(
        jax.tree_util.tree_leaves(eager), jax.tree_util.tree_leaves(jitted)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

"""Visualization smoke tests: every head type renders CHW uint8 panels."""

import numpy as np
import jax.numpy as jnp
from flax import nnx

from sihl_tpu import SihlModel, Backbone
from sihl_tpu.heads import (
    MulticlassClassification,
    ObjectDetection,
    SemanticSegmentation,
    TextRecognition,
)
from sihl_tpu.visualization import visualize, get_images

from conftest import make_pyramid

BATCH = 1
H = W = 64


def pyramid():
    return [jnp.asarray(x) for x in make_pyramid(batch_size=BATCH, height=H, width=W)]


def test_get_images_per_head():
    inputs = pyramid()
    channels = [x.shape[-1] for x in inputs]
    rngs = nnx.Rngs(0)
    rng = np.random.RandomState(0)

    cases = [
        (
            MulticlassClassification(channels, 4, num_channels=8, rngs=rngs),
            {"categories": ["a", "b", "c", "d"]},
            jnp.asarray([2]),
        ),
        (
            ObjectDetection(channels, 3, num_channels=16, num_layers=1,
                            max_instances=5, max_targets=3, rngs=rngs),
            {"categories": ["x", "y", "z"]},
            {
                "classes": jnp.asarray([[0, -1, -1]]),
                "boxes": jnp.asarray([[[4.0, 4.0, 30.0, 30.0], [0] * 4, [0] * 4]]),
            },
        ),
        (
            SemanticSegmentation(channels, 4, num_channels=8, num_layers=1, rngs=rngs),
            {},
            jnp.asarray(rng.randint(0, 4, (BATCH, H, W))),
        ),
        (
            TextRecognition(channels, 9, 5, num_channels=16, embedding_dim=32, rngs=rngs),
            {},
            jnp.asarray([[1, 2, 9, 9, 9]]),
        ),
    ]
    for head, config, target in cases:
        head.eval()
        images = get_images(head, config, inputs[0], target, inputs)
        assert len(images) == BATCH, type(head)
        for img in images:
            assert img.dtype == np.uint8
            assert img.ndim == 3 and img.shape[0] == 3  # CHW RGB


def test_visualize_orchestrator():
    rngs = nnx.Rngs(0)
    backbone = Backbone("resnet18", rngs=rngs)
    head = MulticlassClassification(backbone.out_channels, 3, num_channels=8, rngs=rngs)
    model = SihlModel(backbone, None, [head])
    logged = []
    visualize(
        model,
        configs=[{}],
        input=jnp.ones((1, 64, 64, 3)),
        targets=[jnp.asarray([1])],
        logger=lambda tag, img, step: logged.append((tag, img.shape, step)),
        step=7,
        prefix="train/",
    )
    assert len(logged) == 1
    assert logged[0][0] == "train/0/visualizations/0"
    assert logged[0][2] == 7

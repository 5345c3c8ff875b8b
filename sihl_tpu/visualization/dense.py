"""Visualizations for dense per-pixel heads (reference
``src/sihl/visualization/{semantic_segmentation,depth_estimation,
autoencoding,anomaly_detection}.py``)."""

from typing import List

import numpy as np

from sihl_tpu.heads import (
    AnomalyDetection,
    Autoencoding,
    DepthEstimation,
    SemanticSegmentation,
)
from sihl_tpu.visualization.common import (
    class_color_map,
    finish,
    get_images,
    three_panel,
    to_uint8_image,
)


@get_images.register(SemanticSegmentation)
def _(head, config, input, target, features) -> List[np.ndarray]:
    scores, class_maps = (np.asarray(v) for v in head(features))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        if target is not None:
            axes[1].imshow(class_color_map(np.asarray(target)[b]))
        axes[2].imshow(image, alpha=0.4)
        axes[2].imshow(class_color_map(class_maps[b]), alpha=0.6)
        out.append(finish(fig))
    return out


@get_images.register(DepthEstimation)
def _(head, config, input, target, features) -> List[np.ndarray]:
    depth = np.asarray(head(features))
    images = to_uint8_image(np.asarray(input))
    lo, hi = head.lower_bound, head.upper_bound
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        if target is not None:
            tgt = np.asarray(target["targets"] if isinstance(target, dict) else target)[b]
            axes[1].imshow(tgt, vmin=lo, vmax=hi, cmap="magma")
        axes[2].imshow(depth[b], vmin=lo, vmax=hi, cmap="magma")
        out.append(finish(fig))
    return out


@get_images.register(Autoencoding)
def _(head, config, input, target, features) -> List[np.ndarray]:
    reconstructions, _ = head(features)
    reconstructions = to_uint8_image(np.asarray(reconstructions))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image, titles=("Input", "Reconstruction"))
        axes[1].imshow(reconstructions[b])
        out.append(finish(fig))
    return out


@get_images.register(AnomalyDetection)
def _(head, config, input, target, features) -> List[np.ndarray]:
    anomaly = np.asarray(head(features))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        if target is not None:
            axes[1].imshow(np.asarray(target)[b], vmin=0, vmax=1, cmap="Reds")
        axes[2].imshow(image, alpha=0.5)
        axes[2].imshow(anomaly[b], vmin=0, vmax=1, cmap="Reds", alpha=0.5)
        out.append(finish(fig))
    return out

"""Visualizations for the classification/regression heads (reference
``src/sihl/visualization/multiclass_classification.py`` et al.)."""

from typing import List

import numpy as np

from sihl_tpu.heads import (
    MulticlassClassification,
    MultilabelClassification,
    Regression,
)
from sihl_tpu.visualization.common import finish, get_images, three_panel, to_uint8_image


def _label(config, idx):
    cats = config.get("categories") if config else None
    return str(idx) if cats is None else str(cats[idx])


@get_images.register(MulticlassClassification)
def _(head, config, input, target, features) -> List[np.ndarray]:
    scores, classes = head(features)
    scores, classes = np.asarray(scores), np.asarray(classes)
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        axes[1].axis("off")
        if target is not None:
            axes[1].text(0.5, 0.5, _label(config, int(np.asarray(target)[b])),
                         ha="center", va="center", fontsize=14)
        axes[2].axis("off")
        axes[2].text(0.5, 0.5, f"{_label(config, int(classes[b]))}\n({scores[b]:.2f})",
                     ha="center", va="center", fontsize=14)
        out.append(finish(fig))
    return out


@get_images.register(MultilabelClassification)
def _(head, config, input, target, features) -> List[np.ndarray]:
    scores, labels = head(features)
    scores, labels = np.asarray(scores), np.asarray(labels)
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        axes[1].axis("off")
        if target is not None:
            present = np.nonzero(np.asarray(target)[b] > 0.5)[0]
            axes[1].text(0.5, 0.5, "\n".join(_label(config, int(i)) for i in present),
                         ha="center", va="center", fontsize=10)
        axes[2].axis("off")
        positive = [(l, s) for l, s in zip(labels[b], scores[b]) if s > 0.5]
        axes[2].text(0.5, 0.5,
                     "\n".join(f"{_label(config, int(l))} ({s:.2f})" for l, s in positive),
                     ha="center", va="center", fontsize=10)
        out.append(finish(fig))
    return out


@get_images.register(Regression)
def _(head, config, input, target, features) -> List[np.ndarray]:
    values = np.asarray(head(features))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        axes[1].axis("off")
        if target is not None:
            axes[1].text(0.5, 0.5, f"{float(np.asarray(target)[b]):.3f}",
                         ha="center", va="center", fontsize=14)
        axes[2].axis("off")
        axes[2].text(0.5, 0.5, f"{float(values[b]):.3f}",
                     ha="center", va="center", fontsize=14)
        out.append(finish(fig))
    return out

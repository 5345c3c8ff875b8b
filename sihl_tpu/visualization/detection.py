"""Visualizations for box/quad detection heads (reference
``src/sihl/visualization/object_detection.py`` / ``quadrilateral_detection.py``):
Input / Target / Prediction panels with colored geometry and the loc-head
saliency overlay."""

from typing import List

import numpy as np
from matplotlib import patches

from sihl_tpu.heads import ObjectDetection, QuadrilateralDetection
from sihl_tpu.ops.image import interpolate
from sihl_tpu.visualization.common import (
    color_for,
    finish,
    get_images,
    three_panel,
    to_uint8_image,
)


def _category(config, idx):
    cats = config.get("categories") if config else None
    return str(idx) if cats is None else str(cats[idx])


@get_images.register(ObjectDetection)
def _(head, config, input, target, features) -> List[np.ndarray]:
    num_instances, scores, pred_labels, pred_boxes = (
        np.asarray(v) for v in head(features)
    )
    saliency = np.asarray(head.get_saliency(features))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        seen = []
        fig, axes = three_panel(image)

        def box_patch(label, box, score=1.0):
            label = _category(config, int(label))
            legend = None
            if label not in seen:
                seen.append(label)
                legend = label
            return patches.Rectangle(
                (box[0], box[1]), box[2] - box[0], box[3] - box[1],
                linewidth=1, edgecolor=color_for(seen.index(label)),
                facecolor="none", label=legend, alpha=float(score),
            )

        axes[1].imshow(np.full_like(image, 255))
        if target is not None:
            classes = np.asarray(target["classes"])[b]
            boxes = np.asarray(target["boxes"])[b]
            for label, box in zip(classes, boxes):
                if label >= 0:
                    axes[1].add_patch(box_patch(label, box))
        axes[2].imshow(image, alpha=0.5)
        sal = saliency[b]
        ys = (np.arange(image.shape[0]) * sal.shape[0] / image.shape[0]).astype(int)
        xs = (np.arange(image.shape[1]) * sal.shape[1] / image.shape[1]).astype(int)
        axes[2].imshow(sal[ys][:, xs], vmin=0, vmax=1, cmap="Reds", alpha=0.5)
        for i in range(int(num_instances[b])):
            axes[2].add_patch(
                box_patch(pred_labels[b, i], pred_boxes[b, i], scores[b, i])
            )
        out.append(finish(fig, seen))
    return out


@get_images.register(QuadrilateralDetection)
def _(head, config, input, target, features) -> List[np.ndarray]:
    num_instances, scores, pred_labels, pred_quads = (
        np.asarray(v) for v in head(features)
    )
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        seen = []
        fig, axes = three_panel(image)

        def quad_patch(label, quad, score=1.0):
            label = _category(config, int(label))
            legend = None
            if label not in seen:
                seen.append(label)
                legend = label
            return patches.Polygon(
                quad, closed=True, linewidth=1,
                edgecolor=color_for(seen.index(label)), facecolor="none",
                label=legend, alpha=float(score),
            )

        axes[1].imshow(np.full_like(image, 255))
        if target is not None:
            classes = np.asarray(target["classes"])[b]
            quads = np.asarray(target["quads"])[b]
            for label, quad in zip(classes, quads):
                if label >= 0:
                    axes[1].add_patch(quad_patch(label, quad))
        axes[2].imshow(image, alpha=0.5)
        for i in range(int(num_instances[b])):
            axes[2].add_patch(
                quad_patch(pred_labels[b, i], pred_quads[b, i], scores[b, i])
            )
        out.append(finish(fig, seen))
    return out

"""Visualizations for instance-level heads (reference
``src/sihl/visualization/{instance_segmentation,keypoint_detection}.py``
plus the reconstructed panoptic head)."""

from typing import List

import numpy as np

from sihl_tpu.heads import InstanceSegmentation, KeypointDetection, PanopticSegmentation
from sihl_tpu.visualization.common import (
    COLORS,
    class_color_map,
    color_for,
    finish,
    get_images,
    three_panel,
    to_uint8_image,
)


def _overlay_masks(ax, image, masks, labels, scores=None):
    ax.imshow(image, alpha=0.6)
    overlay = np.zeros(image.shape[:2] + (4,), np.float32)
    for i, mask in enumerate(masks):
        color = color_for(int(labels[i]) + 1)
        m = mask > 0.5
        if m.shape != image.shape[:2]:
            ys = (np.arange(image.shape[0]) * m.shape[0] / image.shape[0]).astype(int)
            xs = (np.arange(image.shape[1]) * m.shape[1] / image.shape[1]).astype(int)
            m = m[ys][:, xs]
        alpha = 0.5 if scores is None else 0.5 * float(scores[i])
        overlay[m] = list(color) + [alpha]
    ax.imshow(overlay)


@get_images.register(InstanceSegmentation)
def _(head, config, input, target, features) -> List[np.ndarray]:
    num_instances, scores, labels, masks = (np.asarray(v) for v in head(features))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        if target is not None:
            t_classes = np.asarray(target["classes"])[b]
            t_masks = np.asarray(target["masks"])[b]
            valid = t_classes >= 0
            _overlay_masks(axes[1], image, t_masks[valid], t_classes[valid])
        n = int(num_instances[b])
        _overlay_masks(axes[2], image, masks[b, :n], labels[b, :n], scores[b, :n])
        out.append(finish(fig))
    return out


@get_images.register(KeypointDetection)
def _(head, config, input, target, features) -> List[np.ndarray]:
    num_instances, scores, presence, keypoints = (np.asarray(v) for v in head(features))
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        axes[1].imshow(image, alpha=0.5)
        if target is not None:
            t_kpts = np.asarray(target["keypoints"])[b]
            t_pres = np.asarray(target["presence"])[b]
            for t in range(t_kpts.shape[0]):
                vis = t_pres[t] > 0
                if vis.any():
                    axes[1].scatter(
                        t_kpts[t][vis, 0], t_kpts[t][vis, 1], s=12,
                        color=color_for(t + 1), marker="o",
                    )
        axes[2].imshow(image, alpha=0.5)
        for i in range(int(num_instances[b])):
            vis = presence[b, i] > 0.5
            if vis.any():
                axes[2].scatter(
                    keypoints[b, i][vis, 0], keypoints[b, i][vis, 1], s=12,
                    color=color_for(i + 1), marker="x",
                )
        out.append(finish(fig))
    return out


@get_images.register(PanopticSegmentation)
def _(head, config, input, target, features) -> List[np.ndarray]:
    class_map, id_map, num_instances, scores, classes = (
        np.asarray(v) for v in head(features)
    )
    images = to_uint8_image(np.asarray(input))
    out = []
    for b, image in enumerate(images):
        fig, axes = three_panel(image)
        if target is not None:
            semantic = np.asarray(target["semantic"])[b]
            axes[1].imshow(class_color_map(np.where(semantic < 0, 0, semantic)))
        # color by class, brightness-jitter by instance id for separation
        rgb = class_color_map(class_map[b]).astype(np.float32)
        jitter = ((id_map[b] % 5).astype(np.float32) - 2.0) * 12.0
        axes[2].imshow(np.clip(rgb + jitter[..., None], 0, 255).astype(np.uint8))
        out.append(finish(fig))
    return out

"""Visualization orchestrator (reference
``src/sihl/visualization/__init__.py:27-47``): renders per-head
Input/Target/Prediction matplotlib panels and hands CHW uint8 images to a
logger.

The ``logger`` may be a TensorBoard-style object exposing
``add_image(tag, img, global_step=...)`` (directly or under
``.experiment``), or any callable ``(tag, img, step)``.
"""

from typing import Any

from sihl_tpu.model import SihlModel
from sihl_tpu.visualization.common import get_images
from sihl_tpu.visualization import (  # noqa: F401  (register dispatches)
    classification,
    detection,
    dense,
    embedding,
    instances,
)


def _emit(logger, tag, img, step):
    target = getattr(logger, "experiment", logger)
    if hasattr(target, "add_image"):
        target.add_image(tag, img, global_step=step)
    else:
        logger(tag, img, step)


def visualize(
    model: SihlModel,
    configs: Any,
    input,
    targets: Any,
    logger: Any,
    step: int,
    start_idx: int = 0,
    prefix: str = "",
) -> None:
    model.eval()
    features = model.extract_features(input)
    for idx, (config, head, target) in enumerate(zip(configs, model.heads, targets)):
        if getattr(head, "target_is_second_view", False):
            target = model.extract_features(target[: features[0].shape[0]])
        vizs = get_images(head, config, input, target, features)
        for viz_idx, viz_img in enumerate(vizs):
            _emit(logger, f"{prefix}{idx}/visualizations/{start_idx + viz_idx}",
                  viz_img, step)

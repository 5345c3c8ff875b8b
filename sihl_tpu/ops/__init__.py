"""Pure-JAX ops: geometry, losses, embeddings, image filters.

These replace the native kernels sihl pulls from torchvision/torch
(``complete_box_iou``, ``masks_to_boxes``, ``sigmoid_focal_loss``, resize,
blur) with jit-fusable, statically-shaped JAX equivalents (SURVEY.md §2.6).
"""

from sihl_tpu.ops.embeddings import (
    coordinate_grid,
    sine_embedding_1d,
    sine_embedding_2d,
    sine_embedding_2d_grid,
)
from sihl_tpu.ops.boxes import (
    box_iou,
    complete_box_iou,
    complete_box_iou_loss,
    masks_to_boxes,
    points_to_bbox,
    bbox_matching,
)
from sihl_tpu.ops.losses import (
    binary_cross_entropy,
    binary_cross_entropy_with_logits,
    cross_entropy,
    focal_loss,
    sigmoid_focal_loss,
    tversky_loss,
    ssim_loss,
    log_cosh_loss,
)
from sihl_tpu.ops.image import (
    upsample2x_nearest,
    interpolate,
    avg_pool2d,
    max_pool2d,
    adaptive_avg_pool,
    edges,
    gaussian_blur,
    blur_pool_2d,
)

__all__ = [
    "coordinate_grid",
    "sine_embedding_1d",
    "sine_embedding_2d",
    "sine_embedding_2d_grid",
    "box_iou",
    "complete_box_iou",
    "complete_box_iou_loss",
    "masks_to_boxes",
    "points_to_bbox",
    "bbox_matching",
    "binary_cross_entropy",
    "binary_cross_entropy_with_logits",
    "cross_entropy",
    "focal_loss",
    "sigmoid_focal_loss",
    "tversky_loss",
    "ssim_loss",
    "log_cosh_loss",
    "upsample2x_nearest",
    "interpolate",
    "avg_pool2d",
    "max_pool2d",
    "adaptive_avg_pool",
    "edges",
    "gaussian_blur",
    "blur_pool_2d",
]

"""Box geometry: IoU / CIoU, mask→box reduction, and anchor↔gt matching.

Replaces the native torchvision kernels used by the reference
(``ops.complete_box_iou`` / ``complete_box_iou_loss`` at
``src/sihl/heads/object_detection.py:194,263``; ``ops.masks_to_boxes`` at
``src/sihl/heads/instance_segmentation.py:194``) with pure-JAX,
statically-shaped equivalents.  ``bbox_matching`` reproduces the reference's
static top-k assignment (``object_detection.py:252-284``) but operates on
*padded* ground truth with a validity mask so the whole batch can be
``vmap``-ed into one XLA program instead of a per-image Python loop.

Boxes are ``(x1, y1, x2, y2)``.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _areas(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(
        boxes[..., 3] - boxes[..., 1], 0
    )


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix between (N, 4) and (M, 4) boxes -> (N, M)."""
    area1 = _areas(boxes1)
    area2 = _areas(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / (union + _EPS)


def _ciou_terms(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, pairwise: bool
) -> jnp.ndarray:
    """Complete-box-IoU; pairwise=False gives the (N, M) matrix form."""
    if pairwise:
        b1, b2 = boxes1, boxes2
    else:
        b1 = boxes1[:, None, :]
        b2 = boxes2[None, :, :]
    x1, y1, x2, y2 = b1[..., 0], b1[..., 1], b1[..., 2], b1[..., 3]
    x1g, y1g, x2g, y2g = b2[..., 0], b2[..., 1], b2[..., 2], b2[..., 3]

    # IoU
    inter_w = jnp.clip(jnp.minimum(x2, x2g) - jnp.maximum(x1, x1g), 0)
    inter_h = jnp.clip(jnp.minimum(y2, y2g) - jnp.maximum(y1, y1g), 0)
    inter = inter_w * inter_h
    union = (
        jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
        + jnp.clip(x2g - x1g, 0) * jnp.clip(y2g - y1g, 0)
        - inter
    )
    iou = inter / (union + _EPS)

    # normalized center distance (DIoU term)
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    cxg, cyg = (x1g + x2g) / 2, (y1g + y2g) / 2
    ex1, ey1 = jnp.minimum(x1, x1g), jnp.minimum(y1, y1g)
    ex2, ey2 = jnp.maximum(x2, x2g), jnp.maximum(y2, y2g)
    diag_sq = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2 + _EPS
    center_sq = (cx - cxg) ** 2 + (cy - cyg) ** 2
    diou = iou - center_sq / diag_sq

    # aspect-ratio consistency (CIoU term); alpha is a detached weight
    w, h = x2 - x1, y2 - y1
    wg, hg = x2g - x1g, y2g - y1g
    v = (4.0 / (jnp.pi**2)) * (
        jnp.arctan(wg / (hg + _EPS)) - jnp.arctan(w / (h + _EPS))
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + _EPS))
    return diou - alpha * v


def complete_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """CIoU matrix between (N, 4) and (M, 4) boxes -> (N, M)."""
    return _ciou_terms(boxes1, boxes2, pairwise=False)


def complete_box_iou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise CIoU loss (1 - CIoU) for matched (..., 4) box pairs."""
    b1 = boxes1.astype(jnp.float32)
    b2 = boxes2.astype(jnp.float32)
    return 1.0 - _ciou_terms(b1, b2, pairwise=True)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes (N, 4) of binary masks (N, H, W); zeros for empty masks."""
    n, h, w = masks.shape
    valid = masks > 0
    xs = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, None, :], (n, h, w))
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[None, :, None], (n, h, w))
    big = jnp.float32(1e9)
    x1 = jnp.min(jnp.where(valid, xs, big), axis=(1, 2))
    y1 = jnp.min(jnp.where(valid, ys, big), axis=(1, 2))
    x2 = jnp.max(jnp.where(valid, xs, -big), axis=(1, 2))
    y2 = jnp.max(jnp.where(valid, ys, -big), axis=(1, 2))
    boxes = jnp.stack([x1, y1, x2, y2], axis=1)
    nonempty = jnp.any(valid, axis=(1, 2))[:, None]
    return jnp.where(nonempty, boxes, 0.0)


def points_to_bbox(points: jnp.ndarray) -> jnp.ndarray:
    """(N, K, 2) keypoint sets -> (N, 4) enclosing boxes.

    Parity: reference ``src/sihl/utils/__init__.py:146-152``.
    """
    min_xy = jnp.min(points, axis=-2)
    max_xy = jnp.max(points, axis=-2)
    return jnp.concatenate([min_xy, max_xy], axis=-1)


def bbox_matching(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    topk: int = 9,
    relative: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static top-k anchor↔gt assignment over padded ground truth.

    Semantics mirror the reference (``object_detection.py:252-284``): CIoU
    between anchors and gt is clamped to >= 0; each gt claims its ``topk``
    best anchors; each claimed anchor keeps its highest-IoU gt.  With
    ``relative=True`` the second return is "relative IoU" — the anchor's IoU
    divided by the best IoU any anchor achieves for the assigned gt (==1 for
    the best anchor; NaN from 0/0 maps to 0).

    Args:
        anchors: (A, 4) anchor boxes.
        gt_boxes: (G, 4) padded ground-truth boxes.
        gt_mask: (G,) validity of each gt row (bool or {0,1}).
        topk: anchors claimed per gt.
        relative: return relative IoU instead of raw matched IoU.

    Returns:
        assignment: (A,) int32 gt index, -1 where unmatched.
        iou_or_rel_iou: (A,) float32.
    """
    num_anchors = anchors.shape[0]
    gt_mask = gt_mask.astype(bool)

    ious = jnp.clip(complete_box_iou(anchors, gt_boxes), 0)  # (A, G)
    ious = jnp.where(gt_mask[None, :], ious, 0.0)

    k = min(topk, num_anchors)
    # Per-gt top-k via the k-th-largest *threshold* instead of lax.top_k:
    # a sort over the anchor axis is by far the most expensive op in the
    # train step on TPU (one sort = ~15 ms/step at COCO scale), while k-1
    # masked argmax passes are pure VPU reductions.  Anchors tied exactly at
    # the threshold are all claimed (measure-zero for real IoUs), and
    # zero-IoU anchors are never claimed — both deviations carry zero loss
    # weight downstream (rel_iou == 0).
    # ties at the threshold are all claimed (measure-zero for real IoUs) and
    # zero-IoU anchors never are — both deviations carry zero loss weight.
    # On TPU the k-1 masked-max passes run fused in one VMEM kernel
    # (ops/pallas/topk.py); elsewhere as plain XLA passes.
    from sihl_tpu.ops.pallas.topk import row_best_and_kth

    work = ious.T  # (G, A)
    best_iou_per_gt, kth = row_best_and_kth(work, k)
    is_topk = (work >= kth[:, None]) & (work > 0.0)  # (G, A)

    masked_ious = jnp.where(is_topk.T, ious, 0.0)  # (A, G)
    max_ious = jnp.max(masked_ious, axis=1)  # (A,)
    max_gt_idxs = jnp.argmax(masked_ious, axis=1)
    valid = max_ious > 0.0

    assignment = jnp.where(valid, max_gt_idxs, -1).astype(jnp.int32)
    if not relative:
        return assignment, max_ious

    # one-hot selection instead of a gather: the vmapped (A,)<-(G,) gather is
    # VMEM-read bound (~1 ms/step at COCO scale); a where+sum pass fuses
    num_gt = gt_boxes.shape[0]
    onehot = jnp.arange(num_gt)[None, :] == max_gt_idxs[:, None]  # (A, G)
    best_for_assignment = jnp.sum(
        jnp.where(onehot, best_iou_per_gt[None, :], 0.0), axis=1
    )
    rel = max_ious / best_for_assignment
    rel = jnp.nan_to_num(rel, nan=0.0, posinf=0.0, neginf=0.0)
    return assignment, jnp.where(valid, rel, 0.0)

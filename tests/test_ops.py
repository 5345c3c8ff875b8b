"""Parity tests for sihl_tpu.ops against torch/torchvision CPU references."""

import numpy as np
import pytest
import jax.numpy as jnp

import sihl_tpu.ops as ops


def test_coordinate_grid():
    grid = np.asarray(ops.coordinate_grid(4, 8))
    assert grid.shape == (4, 8, 2)
    assert np.isclose(grid[0, 0, 0], 1 / 16)  # x of first pixel center
    assert np.isclose(grid[0, 0, 1], 1 / 8)  # y of first pixel center
    assert np.isclose(grid[-1, -1, 0], 1 - 1 / 16)
    assert np.isclose(grid[-1, -1, 1], 1 - 1 / 8)


def test_sine_embedding_shapes():
    emb = ops.sine_embedding_1d(jnp.arange(10.0), 32)
    assert emb.shape == (10, 32)
    grid = ops.sine_embedding_2d_grid(4, 6, 64)
    assert grid.shape == (4, 6, 64)
    # parity with the reference construction: first half embeds y
    col = np.asarray(grid)
    assert np.allclose(col[0, 0, :16], np.sin(0.0))


def _np_box_iou(b1, b2):
    """Independent numpy pairwise IoU (for parity checks)."""
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[:, None] + area2[None, :] - inter)


def _np_complete_box_iou(b1, b2):
    """Independent numpy CIoU matrix, straight from Zheng et al. 2020."""
    iou = _np_box_iou(b1, b2)
    b1e, b2e = b1[:, None, :], b2[None, :, :]
    cx1, cy1 = (b1e[..., 0] + b1e[..., 2]) / 2, (b1e[..., 1] + b1e[..., 3]) / 2
    cx2, cy2 = (b2e[..., 0] + b2e[..., 2]) / 2, (b2e[..., 1] + b2e[..., 3]) / 2
    ex1 = np.minimum(b1e[..., 0], b2e[..., 0])
    ey1 = np.minimum(b1e[..., 1], b2e[..., 1])
    ex2 = np.maximum(b1e[..., 2], b2e[..., 2])
    ey2 = np.maximum(b1e[..., 3], b2e[..., 3])
    diag = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    center = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2
    w1, h1 = b1e[..., 2] - b1e[..., 0], b1e[..., 3] - b1e[..., 1]
    w2, h2 = b2e[..., 2] - b2e[..., 0], b2e[..., 3] - b2e[..., 1]
    v = 4 / np.pi**2 * (np.arctan(w2 / h2) - np.arctan(w1 / h1)) ** 2
    alpha = v / (1 - iou + v + 1e-7)
    return iou - center / diag - alpha * v


def test_box_iou_parity():
    rng = np.random.RandomState(0)
    b1 = rng.rand(13, 4).astype(np.float32)
    b2 = rng.rand(7, 4).astype(np.float32)
    b1[:, 2:] += b1[:, :2]
    b2[:, 2:] += b2[:, :2]
    ours = np.asarray(ops.box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.allclose(ours, _np_box_iou(b1, b2), atol=1e-5)


def test_complete_box_iou_parity():
    rng = np.random.RandomState(1)
    b1 = rng.rand(11, 4).astype(np.float32)
    b2 = rng.rand(5, 4).astype(np.float32)
    b1[:, 2:] += b1[:, :2] + 0.05
    b2[:, 2:] += b2[:, :2] + 0.05
    ours = np.asarray(ops.complete_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.allclose(ours, _np_complete_box_iou(b1, b2), atol=1e-4)


def test_complete_box_iou_loss_parity():
    rng = np.random.RandomState(2)
    b1 = rng.rand(9, 4).astype(np.float32)
    b2 = rng.rand(9, 4).astype(np.float32)
    b1[:, 2:] += b1[:, :2] + 0.05
    b2[:, 2:] += b2[:, :2] + 0.05
    ours = np.asarray(ops.complete_box_iou_loss(jnp.asarray(b1), jnp.asarray(b2)))
    theirs = 1.0 - np.diagonal(_np_complete_box_iou(b1, b2))
    assert np.allclose(ours, theirs, atol=1e-4)


def test_masks_to_boxes():
    rng = np.random.RandomState(3)
    masks = (rng.rand(4, 16, 16) > 0.7).astype(np.float32)
    masks[0] = 0  # empty mask -> zeros
    ours = np.asarray(ops.masks_to_boxes(jnp.asarray(masks)))
    for i in range(1, 4):
        ys, xs = np.nonzero(masks[i])
        assert np.allclose(ours[i], [xs.min(), ys.min(), xs.max(), ys.max()])
    assert np.allclose(ours[0], 0.0)


def test_bbox_matching_matches_reference_semantics():
    """Padded/vmappable matching equals the dynamic-shape reference algorithm."""
    import torch

    rng = np.random.RandomState(4)
    anchors = rng.rand(50, 4).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2] + 0.05
    gt = rng.rand(6, 4).astype(np.float32)
    gt[:, 2:] += gt[:, :2] + 0.05
    max_gt = 10
    gt_padded = np.zeros((max_gt, 4), np.float32)
    gt_padded[:6] = gt
    mask = np.zeros((max_gt,), bool)
    mask[:6] = True

    assignment, rel_iou = ops.bbox_matching(
        jnp.asarray(anchors), jnp.asarray(gt_padded), jnp.asarray(mask), topk=9,
        relative=True,
    )
    assignment, rel_iou = np.asarray(assignment), np.asarray(rel_iou)

    # reference algorithm (dynamic shapes, torch, reference object_detection.py:252-284)
    ious = torch.tensor(_np_complete_box_iou(anchors, gt), dtype=torch.float32).clamp(0)
    topk_ious, topk_idxs = torch.topk(ious, k=9, dim=0)
    is_topk = torch.zeros((50, 6), dtype=torch.bool)
    is_topk.scatter_(0, topk_idxs, True)
    max_ious, max_gt_idxs = torch.max(ious * is_topk.float(), dim=1)
    valid = is_topk.any(dim=1)
    ref_assign = torch.full((50,), -1)
    ref_assign[valid] = max_gt_idxs[valid]
    best_per_gt = topk_ious[0]
    ref_rel = torch.zeros(50)
    ref_rel[valid] = (max_ious[valid] / best_per_gt[max_gt_idxs][valid]).nan_to_num(0)

    # tie-breaking among zero-IoU anchors differs between torch.topk and
    # lax.top_k; those matches carry zero loss weight, so compare only
    # loss-bearing entries.
    ref_rel = ref_rel.numpy()
    bearing = ref_rel > 0
    assert np.array_equal(bearing, rel_iou > 0)
    assert np.array_equal(assignment[bearing], ref_assign.numpy()[bearing])
    assert np.allclose(rel_iou, ref_rel, atol=1e-4)


def test_bbox_matching_empty_gt():
    anchors = jnp.asarray(np.random.RandomState(0).rand(20, 4), jnp.float32)
    gt = jnp.zeros((5, 4))
    mask = jnp.zeros((5,), bool)
    assignment, rel_iou = ops.bbox_matching(anchors, gt, mask, relative=True)
    assert np.all(np.asarray(assignment) == -1)
    assert np.all(np.asarray(rel_iou) == 0)


def test_focal_loss_vs_reference_formula():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(5)
    probs = rng.rand(10).astype(np.float32) * 0.98 + 0.01
    targets = (rng.rand(10) > 0.5).astype(np.float32)
    ours = np.asarray(ops.focal_loss(jnp.asarray(probs), jnp.asarray(targets)))
    p, t = torch.tensor(probs), torch.tensor(targets)
    ce = F.binary_cross_entropy(p, t, reduction="none")
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = 0.25 * t + 0.75 * (1 - t)
    theirs = (alpha_t * ce * (1 - p_t) ** 2).numpy()
    assert np.allclose(ours, theirs, atol=1e-4)


def test_sigmoid_focal_loss_parity():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(6)
    logits = rng.randn(12).astype(np.float32)
    targets = (rng.rand(12) > 0.5).astype(np.float32)
    ours = np.asarray(ops.sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    # torchvision sigmoid_focal_loss formula, independently implemented
    lt, tt = torch.tensor(logits), torch.tensor(targets)
    p = torch.sigmoid(lt)
    ce = F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    loss = ce * (1 - p_t) ** 2
    theirs = (0.25 * tt + 0.75 * (1 - tt)) * loss
    assert np.allclose(ours, theirs.numpy(), atol=1e-4)


def test_cross_entropy_vs_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(7)
    logits = rng.randn(6, 5).astype(np.float32)
    targets = rng.randint(0, 5, size=(6,))
    targets[0] = -100
    ours = np.asarray(
        ops.cross_entropy(
            jnp.asarray(logits), jnp.asarray(targets), label_smoothing=0.1,
            ignore_index=-100,
        )
    )
    theirs = F.cross_entropy(
        torch.tensor(logits), torch.tensor(targets), label_smoothing=0.1,
        ignore_index=-100, reduction="none",
    ).numpy()
    assert np.allclose(ours, theirs, atol=1e-4)


def test_blur_pool_vs_reference():
    """blur_pool_2d == reflect-pad + depthwise binomial conv (torch reference)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(8)
    x = rng.rand(2, 8, 8, 4).astype(np.float32)
    ours = np.asarray(ops.blur_pool_2d(jnp.asarray(x), kernel_size=3, stride=2))

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    coeffs = torch.tensor([0.25, 0.5, 0.25])
    kernel = (coeffs[:, None] * coeffs[None, :])[None, None].repeat(4, 1, 1, 1)
    xp = F.pad(xt, [1, 1, 1, 1], "reflect")
    theirs = F.conv2d(xp, kernel, stride=2, groups=4).permute(0, 2, 3, 1).numpy()
    assert ours.shape == theirs.shape
    assert np.allclose(ours, theirs, atol=1e-5)


def test_upsample2x():
    x = jnp.arange(8.0).reshape(1, 2, 2, 2)
    up = ops.upsample2x_nearest(x)
    assert up.shape == (1, 4, 4, 2)
    assert np.allclose(np.asarray(up)[0, :2, :2, 0], np.asarray(x)[0, 0, 0, 0])


def test_avg_pool_counts_padding():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(9)
    x = rng.rand(1, 6, 6, 3).astype(np.float32)
    ours = np.asarray(ops.avg_pool2d(jnp.asarray(x), 3, stride=1, padding=1))
    xt = torch.tensor(x).permute(0, 3, 1, 2)
    theirs = F.avg_pool2d(xt, 3, stride=1, padding=1).permute(0, 2, 3, 1).numpy()
    assert np.allclose(ours, theirs, atol=1e-5)


def test_ssim_identical_images_zero():
    x = jnp.asarray(np.random.RandomState(10).rand(1, 16, 16, 1), jnp.float32)
    assert float(ops.ssim_loss(x, x)) < 1e-5


def test_log_cosh():
    x = jnp.asarray([0.0, 1.0, -2.0, 10.0])
    ours = np.asarray(ops.log_cosh_loss(x, jnp.zeros_like(x)))
    theirs = np.log(np.cosh(np.asarray(x)))
    assert np.allclose(ours, theirs, atol=1e-5)


def test_polygon_iou():
    from sihl_tpu.utils import polygon_iou

    sq1 = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    sq2 = sq1 + 0.5
    iou = float(polygon_iou(sq1, sq2))
    assert np.isclose(iou, 0.25 / 1.75, atol=1e-5)
    assert np.isclose(float(polygon_iou(sq1, sq1)), 1.0, atol=1e-5)
    far = sq1 + 5.0
    assert np.isclose(float(polygon_iou(sq1, far)), 0.0, atol=1e-6)


def test_optimal_f1_threshold():
    from sihl_tpu.utils import OptimalF1Threshold

    m = OptimalF1Threshold(iou_threshold=0.5)
    gt_boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    gt_classes = np.array([0, 1])
    # one good high-score match, one wrong-class, one low-score noise
    m.update(
        preds_classes=np.array([0, 0, 1]),
        preds_scores=np.array([0.9, 0.8, 0.1], np.float32),
        preds_boxes=np.array(
            [[0, 0, 10, 10], [20, 20, 30, 30], [50, 50, 60, 60]], np.float32
        ),
        target_classes=gt_classes,
        target_boxes=gt_boxes,
    )
    out = m.compute()
    assert 0 < out["best_f1"] <= 1
    # thresholding away the 0.1 noise should be at least as good
    assert out["optimal_threshold"] > 0.1 or out["best_f1"] == 1.0

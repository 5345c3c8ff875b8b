"""Quadrilateral detection head (reference
``src/sihl/heads/quadrilateral_detection.py``): per-level SiLU laterals
plus a global-context vector, tanh vertex offsets from cell centers, its
own 4-tuple matching (one-to-one best-anchor mask + relative IoU), L1 quad
loss and sigmoid-focal class loss.

TPU restructuring: vmapped padded matching (the quad variant keeps the
reference's *unclamped* CIoU products, :277-283), static-size positive
gathers, fp32 losses.  Targets: ``classes (B, T)`` int32 (-1 padded),
``quads (B, T, 4, 2)`` absolute vertices.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import anchors as anchor_lib
from sihl_tpu.heads.base import Head
from sihl_tpu.layers.convblocks import StandardConvNormAct, _rngs
from sihl_tpu.layers.mlp import MLP
from sihl_tpu.ops.boxes import complete_box_iou
from sihl_tpu.ops.losses import binary_cross_entropy_with_logits, sigmoid_focal_loss
from sihl_tpu.training import metrics as M
from sihl_tpu.utils.coco_map import MeanAveragePrecisionAccumulator


def quad_bbox_matching(anchors, gt_boxes, gt_mask, topk: int):
    """Reference quad matching (:265-294) over padded gt: returns
    (assignment, o2o_mask, rel_iou).  Note: products of *unclamped* CIoU
    with the top-k mask are used, faithfully to the reference."""
    num_anchors, num_gt = anchors.shape[0], gt_boxes.shape[0]
    gt_mask = gt_mask.astype(bool)
    ious = complete_box_iou(anchors, gt_boxes)  # (A, G), can be negative
    ious = jnp.where(gt_mask[None, :], ious, -jnp.inf)

    k = min(topk, num_anchors)
    topk_ious, topk_idxs = jax.lax.top_k(ious.T, k)  # (G, k)
    gt_rows = jnp.broadcast_to(jnp.arange(num_gt)[:, None], (num_gt, k))
    is_topk = (
        jnp.zeros((num_gt, num_anchors), bool).at[gt_rows, topk_idxs].set(True)
    )
    is_topk = (is_topk & gt_mask[:, None]).T  # (A, G)
    is_best = (
        jnp.zeros((num_gt, num_anchors), bool)
        .at[jnp.arange(num_gt), topk_idxs[:, 0]]
        .set(True)
    )
    is_best = (is_best & gt_mask[:, None]).T

    safe_ious = jnp.where(gt_mask[None, :], ious, 0.0)
    prod = safe_ious * is_topk.astype(safe_ious.dtype)
    max_gt_idxs = jnp.argmax(prod, axis=1)
    max_ious = jnp.take_along_axis(prod, max_gt_idxs[:, None], axis=1)[:, 0]
    valid = jnp.any(is_topk, axis=1)

    assignment = jnp.where(valid, max_gt_idxs, -1).astype(jnp.int32)
    o2o_mask = jnp.any(is_best, axis=1)
    best_per_gt = topk_ious[:, 0]
    rel = max_ious / best_per_gt[max_gt_idxs]
    rel = jnp.nan_to_num(rel, nan=0.0, posinf=0.0, neginf=0.0)
    return assignment, o2o_mask, jnp.where(valid, rel, 0.0)


class QuadrilateralDetection(Head):
    def __init__(
        self,
        in_channels: List[int],
        num_classes: int,
        bottom_level: int = 3,
        top_level: int = 5,
        num_channels: int = 256,
        num_layers: int = 4,
        max_instances: int = 100,
        max_targets: int = 100,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ) -> None:
        assert num_classes > 0
        assert len(in_channels) > top_level
        assert 0 < bottom_level <= top_level
        assert num_channels % 4 == 0
        rngs = _rngs(rngs)

        self.in_channels = in_channels
        self.num_classes = num_classes
        self.bottom_level, self.top_level = bottom_level, top_level
        self.levels = range(bottom_level, top_level + 1)
        self.num_channels = num_channels
        self.max_instances = max_instances
        self.max_targets = max_targets
        self.topk = 9

        self.laterals = nnx.List(
            StandardConvNormAct(in_channels[level], num_channels, 1, act="silu", rngs=rngs)
            for level in self.levels
        )
        self.global_context = StandardConvNormAct(
            in_channels[top_level], num_channels, 1, act="silu", rngs=rngs
        )
        hidden = [num_channels] * num_layers
        self.loc_head = MLP(num_channels, hidden + [1], rngs=rngs)
        self.class_head = MLP(num_channels, hidden + [num_classes], rngs=rngs)
        self.quad_head = MLP(num_channels, hidden + [8], rngs=rngs)

        self.output_shapes = {
            "num_instances": ("batch_size",),
            "scores": ("batch_size", max_instances),
            "classes": ("batch_size", max_instances),
            "quads": ("batch_size", max_instances, 4, 2),
        }

    # -- geometry (shared machinery, heads/anchors.py) ---------------------
    def get_offsets_and_levels(self, inputs):
        return anchor_lib.cell_centers_with_levels(inputs, self.levels)

    def get_features(self, inputs):
        ctx = jnp.mean(
            self.global_context(inputs[self.top_level]), axis=(1, 2), keepdims=True
        )
        return anchor_lib.flatten_laterals(
            inputs, self.levels, self.laterals, self.num_channels, extra=ctx
        )

    @staticmethod
    def quads_to_boxes(quads):
        x, y = quads[..., 0], quads[..., 1]
        return jnp.stack(
            [x.min(-1), y.min(-1), x.max(-1), y.max(-1)], axis=-1
        )

    @staticmethod
    def canonicalize_and_convexify(quads):
        """Angle-sort vertices around the centroid, then replace concave
        vertices with their neighbors' midpoint (reference :296-316)."""
        centroid = jnp.mean(quads, axis=-2, keepdims=True)
        rel = quads - centroid
        angles = jnp.arctan2(rel[..., 1], rel[..., 0])
        order = jnp.argsort(angles, axis=-1)
        v = jnp.take_along_axis(quads, order[..., None], axis=-2)
        v_next = v[..., [1, 2, 3, 0], :]
        v_prev = v[..., [3, 0, 1, 2], :]
        cross = (v_next[..., 0] - v[..., 0]) * (v_prev[..., 1] - v[..., 1]) - (
            (v_next[..., 1] - v[..., 1]) * (v_prev[..., 0] - v[..., 0])
        )
        mid = (v_prev + v_next) * 0.5
        return jnp.where((cross < 0)[..., None], mid, v)

    # -- inference ---------------------------------------------------------
    def __call__(self, inputs):
        batch, full_h, full_w = inputs[0].shape[0], inputs[0].shape[1], inputs[0].shape[2]
        feats = self.get_features(inputs)
        rel_offsets, levels = self.get_offsets_and_levels(inputs)

        (loc_out,) = anchor_lib.run_mlps(
            feats,
            [self.loc_head],
            num_valid=anchor_lib.num_anchors(inputs, self.levels),
        )
        loc_logits = loc_out[..., 0].astype(jnp.float32)
        num_slots = min(self.max_instances, loc_logits.shape[1])
        loc_logits, loc_idxs = jax.lax.top_k(loc_logits, num_slots)
        scores = jax.nn.sigmoid(loc_logits)
        num_instances = jnp.sum(scores > 0.5, axis=1)
        feats = anchor_lib.gather_anchor_rows(feats, loc_idxs)

        quad_out, class_logits = anchor_lib.run_mlps(
            feats, [self.quad_head, self.class_head], num_valid=feats.shape[1]
        )
        offsets = rel_offsets[loc_idxs]  # (B, I, 8)
        quad_preds = jnp.tanh(quad_out.astype(jnp.float32)) + offsets
        full = jnp.array([full_w, full_h] * 4, jnp.float32)
        quad_preds = (quad_preds * full).reshape(batch, num_slots, 4, 2)

        classes = jnp.argmax(class_logits, axis=2)
        return num_instances, scores, classes, quad_preds

    # -- training ----------------------------------------------------------
    def training_step(self, inputs, classes, quads) -> Tuple[jnp.ndarray, Dict]:
        batch, full_h, full_w = inputs[0].shape[0], inputs[0].shape[1], inputs[0].shape[2]
        feats = self.get_features(inputs)
        rel_offsets, levels = self.get_offsets_and_levels(inputs)

        directions = jnp.array([-1.0, -1.0, 1.0, 1.0])
        scale = jax.nn.sigmoid(levels - self.top_level)  # (A, 1)
        full4 = jnp.array([full_w, full_h, full_w, full_h], jnp.float32)
        anchors = (rel_offsets[:, :4] + directions * scale) * full4

        gt_mask = classes >= 0
        gt_boxes = self.quads_to_boxes(quads.astype(jnp.float32))
        assignment, o2o_mask, rel_iou = jax.vmap(
            lambda b, m: quad_bbox_matching(anchors, b, m, self.topk)
        )(gt_boxes, gt_mask)

        loc_target = rel_iou / self.topk
        loc_target = jnp.where(o2o_mask, 1.0, loc_target)
        any_match = rel_iou.max() > 0.0

        # static-size positive gather
        k = min(self.max_targets * self.topk, rel_iou.shape[1])
        pos_w, pos_idx = jax.lax.top_k(rel_iou, k)
        pos_w, pos_idx = anchor_lib.sort_positives(pos_w, pos_idx)
        pos_feats = anchor_lib.gather_anchor_rows(feats, pos_idx, sorted_unique=True)
        pos_assign = jnp.clip(jnp.take_along_axis(assignment, pos_idx, axis=1), 0, None)
        w_sum = jnp.maximum(jnp.sum(pos_w), 1e-6)

        quad_out, class_logits = anchor_lib.run_mlps(
            pos_feats, [self.quad_head, self.class_head], num_valid=pos_feats.shape[1]
        )

        # quad L1 loss (reference :180-196)
        pos_offsets = rel_offsets[pos_idx]  # (B, k, 8)
        quad_preds = jnp.clip(
            jnp.tanh(quad_out.astype(jnp.float32)) + pos_offsets, 0.0, 1.0
        ).reshape(batch, k, 4, 2)
        quad_target = jnp.take_along_axis(
            quads.astype(jnp.float32), pos_assign[..., None, None], axis=1
        )
        quad_target = self.canonicalize_and_convexify(quad_target) / jnp.array(
            [full_w, full_h], jnp.float32
        )
        l1 = jnp.sum(jnp.abs(quad_preds - quad_target), axis=(2, 3))
        quad_loss = 10.0 * jnp.sum(pos_w * l1) / w_sum

        # focal classification loss (reference :198-208)
        class_logits = class_logits.astype(jnp.float32)
        one_hot = jax.nn.one_hot(
            jnp.take_along_axis(jnp.clip(classes, 0, None), pos_assign, axis=1),
            self.num_classes,
        )
        focal = jnp.sum(sigmoid_focal_loss(class_logits, one_hot), axis=2)
        class_loss = 10.0 * jnp.sum(pos_w * focal) / w_sum

        # location loss (reference :210-216)
        (loc_out,) = anchor_lib.run_mlps(
            feats,
            [self.loc_head],
            num_valid=anchor_lib.num_anchors(inputs, self.levels),
        )
        loc_logits = loc_out[..., 0].astype(jnp.float32)
        loc_bce = binary_cross_entropy_with_logits(loc_logits, loc_target)
        loc_loss = jnp.sum(loc_bce) / jnp.maximum(jnp.sum(loc_target), 1e-6)

        quad_loss = jnp.where(any_match, quad_loss, 0.0)
        class_loss = jnp.where(any_match, class_loss, 0.0)
        loss = loc_loss + quad_loss + class_loss
        return loss, {
            "location_loss": loc_loss,
            "quad_loss": quad_loss,
            "class_loss": class_loss,
        }

    # -- validation --------------------------------------------------------
    def metrics_init(self):
        return {"loss": M.mean_init()}

    def validation_step(self, state, inputs, classes, quads):
        num_instances, scores, pred_classes, quad_preds = self(inputs)
        loss, _ = self.training_step(inputs, classes, quads)
        state = {"loss": M.mean_update(state["loss"], loss)}
        aux = {
            "scores": scores,
            "pred_classes": pred_classes,
            "pred_boxes": self.quads_to_boxes(quad_preds),
            "gt_classes": classes,
            "gt_boxes": self.quads_to_boxes(quads.astype(jnp.float32)),
        }
        return state, loss, aux

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        out = {"loss": float(M.mean_compute(state["loss"]))}
        acc = MeanAveragePrecisionAccumulator()
        for aux in collected:
            acc.update(
                aux["pred_boxes"], aux["pred_classes"], aux["scores"],
                aux["gt_boxes"], aux["gt_classes"],
            )
        out.update(acc.compute())
        return out

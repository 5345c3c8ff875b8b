"""Anchor-free object detection head (reference
``src/sihl/heads/object_detection.py``).

TPU-native restructuring of the reference's algorithm:

* the per-image Python matching loop (reference :143-147) becomes a
  ``vmap`` of :func:`sihl_tpu.ops.boxes.bbox_matching` over **padded**
  ground truth (``classes`` uses -1 padding), so train-step is one XLA
  program;
* the boolean-mask gathers for box/class losses (reference :182-208)
  become a static-size ``top_k`` gather of the (at most
  ``max_targets * topk``) positive anchors — fixed shapes, no host sync;
* the iou auxiliary head runs dense over all anchors exactly like the
  reference (:175);
* all losses in fp32 (the reference's autocast-off islands).

Inference (:99-122) is unchanged: per-level 1x1 laterals, one flattened
anchor list, top-``max_instances`` by localization logit, no NMS —
fully static shapes.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import anchors
from sihl_tpu.heads.anchors import gather_anchor_rows, sort_positives
from sihl_tpu.heads.base import Head
from sihl_tpu.layers.convblocks import StandardConvNormAct, _rngs
from sihl_tpu.layers.mlp import MLP
from sihl_tpu.ops.boxes import bbox_matching, complete_box_iou_loss
from sihl_tpu.ops.losses import binary_cross_entropy_with_logits, cross_entropy
from sihl_tpu.training import metrics as M
from sihl_tpu.utils.coco_map import MeanAveragePrecisionAccumulator


class ObjectDetection(Head):
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
        """
        Args:
            in_channels: channels of input feature maps by level.
            num_classes: number of object categories.
            bottom_level/top_level: pyramid levels this head reads.
            num_channels: conv/MLP width.
            num_layers: MLP depth.
            max_instances: fixed-size inference output slots.
            max_targets: ground-truth padding size (targets per image).
        """
        assert num_classes > 0, num_classes
        assert len(in_channels) > top_level, (len(in_channels), top_level)
        assert 0 < bottom_level <= top_level, (bottom_level, top_level)
        assert num_channels % 4 == 0, num_channels
        assert max_instances > 0
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
            StandardConvNormAct(in_channels[level], num_channels, 1, act=None, rngs=rngs)
            for level in self.levels
        )
        hidden = [num_channels] * num_layers
        # loc head biased low so initial predictions are "no object" (:58)
        self.loc_head = MLP(num_channels, hidden + [1], final_bias_init=-5.0, rngs=rngs)
        self.cls_head = MLP(num_channels, hidden + [num_classes], rngs=rngs)
        self.box_head = MLP(num_channels, hidden + [4], rngs=rngs)
        self.iou_head = MLP(num_channels, hidden + [1], rngs=rngs)  # training only

        self.output_shapes = {
            "num_instances": ("batch_size",),
            "scores": ("batch_size", max_instances),
            "classes": ("batch_size", max_instances),
            "boxes": ("batch_size", max_instances, 4),
        }

    # -- anchors (shared machinery, heads/anchors.py) ----------------------
    def get_offsets_and_scales(self, inputs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return anchors.cell_anchors(inputs, self.levels)

    def flat_features(self, inputs) -> jnp.ndarray:
        return anchors.flatten_laterals(
            inputs, self.levels, self.laterals, self.num_channels
        )

    def _mlp_outputs(self, x, mlps, num_valid: Optional[int] = None) -> List[jnp.ndarray]:
        # num_valid=None means "x is known unpadded" (e.g. gathered rows)
        nv = x.shape[1] if num_valid is None else num_valid
        return anchors.run_mlps(x, mlps, num_valid=nv)

    def get_saliency(self, inputs) -> jnp.ndarray:
        """Max location-probability over levels, upsampled to the bottom
        level's resolution (reference :70-81)."""
        b, fh, fw = inputs[self.bottom_level].shape[:3]
        out = jnp.zeros((b, fh, fw), jnp.float32)
        for level, lateral in zip(self.levels, self.laterals):
            h, w = inputs[level].shape[1:3]
            scores = jax.nn.sigmoid(
                self.loc_head(lateral(inputs[level]).reshape(b, h * w, -1))
            ).reshape(b, h, w)
            scores = jax.image.resize(scores, (b, fh, fw), method="nearest")
            out = jnp.maximum(out, scores.astype(jnp.float32))
        return out

    # -- inference ---------------------------------------------------------
    def __call__(self, inputs) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        batch, height, width = inputs[0].shape[0], inputs[0].shape[1], inputs[0].shape[2]
        full_size = jnp.array([width, height, width, height], jnp.float32)
        flat_feats = self.flat_features(inputs)
        offsets, scales = self.get_offsets_and_scales(inputs)

        (loc_out,) = self._mlp_outputs(
            flat_feats, [self.loc_head], num_valid=offsets.shape[0]
        )
        loc_logits = loc_out[..., 0].astype(jnp.float32)
        num_slots = min(self.max_instances, loc_logits.shape[1])
        loc_logits, loc_idxs = jax.lax.top_k(loc_logits, num_slots)
        flat_feats = gather_anchor_rows(flat_feats, loc_idxs)
        scores = jax.nn.sigmoid(loc_logits)
        num_instances = jnp.sum(scores > 0.5, axis=1)

        class_logits, box_out = self._mlp_outputs(
            flat_feats, [self.cls_head, self.box_head]
        )
        classes = jnp.argmax(class_logits, axis=2)

        offsets = offsets[loc_idxs]  # (B, I, 4)
        scales = scales[loc_idxs]
        box_preds = (
            offsets + scales * jnp.exp(box_out.astype(jnp.float32))
        ) * full_size
        return num_instances, scores, classes, box_preds

    # -- training ----------------------------------------------------------
    def training_step(self, inputs, classes, boxes) -> Tuple[jnp.ndarray, Dict]:
        """classes: (B, T) int32 with -1 padding; boxes: (B, T, 4) absolute."""
        assert len(inputs) > self.top_level, "too few input levels"
        batch, height, width = inputs[0].shape[0], inputs[0].shape[1], inputs[0].shape[2]
        full_size = jnp.array([width, height, width, height], jnp.float32)

        offsets, scales = self.get_offsets_and_scales(inputs)
        anchors = (offsets + scales) * full_size
        gt_mask = classes >= 0

        assignment, rel_iou = jax.vmap(
            lambda b, m: bbox_matching(anchors, b, m, self.topk, relative=True)
        )(boxes.astype(jnp.float32), gt_mask)

        flat_feats = self.flat_features(inputs)

        # location + iou heads, dense over all anchors — one fused pass
        loc_out, iou_out = self._mlp_outputs(
            flat_feats, [self.loc_head, self.iou_head], num_valid=offsets.shape[0]
        )

        # location loss (fp32)
        loc_logits = loc_out[..., 0].astype(jnp.float32)
        loc_target = (rel_iou == 1.0).astype(jnp.float32)
        loc_bce = binary_cross_entropy_with_logits(loc_logits, loc_target)
        num_pos = jnp.sum(loc_target)
        loc_loss = jnp.sum(loc_bce) / jnp.maximum(num_pos, 1.0)

        any_match = rel_iou.max() > 0.0

        # iou regression loss, dense over all anchors (:174-180)
        iou_preds = iou_out[..., 0].astype(jnp.float32)
        rel_sum = jnp.maximum(jnp.sum(rel_iou), 1e-6)
        iou_loss = jnp.sum((iou_preds - rel_iou) ** 2) / rel_sum

        # gather the (static-size) positive anchors per image; re-sorted
        # ascending so the feature gather (and its backward scatter-add)
        # is sorted-and-unique — the losses below are permutation-
        # invariant sums, so this is free semantically
        k = min(self.max_targets * self.topk, rel_iou.shape[1])
        pos_w, pos_idx = jax.lax.top_k(rel_iou, k)  # (B, k)
        pos_w, pos_idx = sort_positives(pos_w, pos_idx)
        pos_feats = gather_anchor_rows(flat_feats, pos_idx, sorted_unique=True)
        pos_assign = jnp.clip(
            jnp.take_along_axis(assignment, pos_idx, axis=1), 0, None
        )

        class_logits, box_out = self._mlp_outputs(
            pos_feats, [self.cls_head, self.box_head]
        )

        # box loss: CIoU between decoded positives and their gt (:186-197)
        pos_offsets = offsets[pos_idx]
        pos_scales = scales[pos_idx]
        box_preds = pos_offsets + pos_scales * jnp.exp(box_out.astype(jnp.float32))
        box_target = jnp.take_along_axis(
            boxes.astype(jnp.float32), pos_assign[..., None], axis=1
        ) / full_size
        box_ciou = complete_box_iou_loss(box_preds, box_target)
        box_loss = jnp.sum(pos_w * box_ciou) / rel_sum

        # classification loss over positives, rel-IoU weighted (:199-208)
        class_target = jnp.take_along_axis(classes, pos_assign, axis=1)
        class_ce = cross_entropy(class_logits, jnp.clip(class_target, 0, None))
        class_loss = jnp.sum(pos_w * class_ce) / rel_sum

        # if no gt matched anywhere, only the location loss applies (:165-172)
        box_loss = jnp.where(any_match, box_loss, 0.0)
        class_loss = jnp.where(any_match, class_loss, 0.0)
        iou_loss = jnp.where(any_match, iou_loss, 0.0)

        loss = loc_loss + 10.0 * box_loss + class_loss + iou_loss
        metrics = {
            "location_loss": loc_loss,
            "box_loss": box_loss,
            "class_loss": class_loss,
            "iou_loss": iou_loss,
        }
        return loss, metrics

    # -- validation --------------------------------------------------------
    # mAP accumulates host-side: the jitted step returns fixed-shape
    # detection/gt arrays in `aux`, the trainer collects them per batch, and
    # `validation_end` runs the (numpy) COCO evaluation — the analog of the
    # reference's faster_coco_eval backend (:219-250).
    def metrics_init(self):
        return {"loss": M.mean_init()}

    def validation_step(self, state, inputs, classes, boxes):
        num_instances, scores, pred_classes, pred_boxes = self(inputs)
        loss, _ = self.training_step(inputs, classes, boxes)
        state = {"loss": M.mean_update(state["loss"], loss)}
        aux = {
            "scores": scores,
            "pred_classes": pred_classes,
            "pred_boxes": pred_boxes,
            "gt_classes": classes,
            "gt_boxes": boxes,
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

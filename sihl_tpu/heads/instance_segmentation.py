"""CondInst-style instance segmentation head (reference
``src/sihl/heads/instance_segmentation.py``).

Shares the anchor-free localization machinery with ObjectDetection; a
``kernel_head`` MLP emits per-instance weights of a 3-layer pointwise
convnet applied to shared mask features + instance-relative coordinates
(reference :71-77, 136-157).

TPU-native restructuring:

* matching runs vmapped over padded ground truth (gt boxes derived from
  masks on-device via :func:`masks_to_boxes`);
* the per-instance dynamic conv is an einsum batched over instances, with
  the first layer **decomposed** so the (B, I, H, W, c+2) concat of mask
  features and relative coordinates is never materialized:
  ``concat(f, g - o) @ W1 = f @ W1f + g @ W1c - o @ W1c``;
* mask-loss positives are a static-size top-``max_mask_positives`` gather
  per image (the reference uses all positive anchors; the cap keeps the
  memory bound static — positives are kept in decreasing rel-IoU order so
  only the lowest-weight tail can be dropped);
* inference masks are returned at ``mask_level`` resolution (the
  reference's declared ``output_shapes``; its forward actually upsamples
  to full resolution — pass ``full_res_masks=True`` for that).
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import anchors as anchor_lib
from sihl_tpu.heads.base import Head
from sihl_tpu.heads.object_detection import ObjectDetection
from sihl_tpu.layers.convblocks import StandardConvNormAct, _rngs
from sihl_tpu.layers.mlp import MLP
from sihl_tpu.ops.boxes import bbox_matching, masks_to_boxes
from sihl_tpu.ops.image import interpolate, packbits_last
from sihl_tpu.ops.losses import binary_cross_entropy_with_logits, cross_entropy
from sihl_tpu.training import metrics as M
from sihl_tpu.utils.coco_map import MeanAveragePrecisionAccumulator


class InstanceSegmentation(Head):
    """https://arxiv.org/abs/2003.05664 (Conditional Convolutions)."""

    def __init__(
        self,
        in_channels: List[int],
        num_classes: int,
        mask_level: int = 3,
        bottom_level: int = 3,
        top_level: int = 5,
        num_channels: int = 256,
        num_layers: int = 4,
        max_instances: int = 100,
        max_targets: int = 100,
        max_mask_positives: int = 256,
        full_res_masks: bool = False,
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
        self.mask_level = mask_level
        self.bottom_level, self.top_level = bottom_level, top_level
        self.levels = range(bottom_level, top_level + 1)
        self.num_channels = num_channels
        self.max_instances = max_instances
        self.max_targets = max_targets
        self.max_mask_positives = max_mask_positives
        self.full_res_masks = full_res_masks
        self.topk = 9

        self.laterals = nnx.List(
            StandardConvNormAct(in_channels[level], num_channels, 1, act=None, rngs=rngs)
            for level in self.levels
        )
        hidden = [num_channels] * num_layers
        self.loc_head = MLP(num_channels, hidden + [1], final_bias_init=-5.0, rngs=rngs)
        self.cls_head = MLP(num_channels, hidden + [num_classes], rngs=rngs)

        c = self.mask_num_channels = 8
        kernel_params = (c + 2) * c + c + c * c + c + c * 1 + 1
        self.kernel_head = MLP(num_channels, hidden + [kernel_params], rngs=rngs)
        self.mask_lateral = StandardConvNormAct(
            in_channels[mask_level], num_channels, 1, act=None, rngs=rngs
        )
        self.mask_head = StandardConvNormAct(num_channels, c, 3, act="silu", rngs=rngs)

        scale = 2**mask_level
        self.output_shapes = {
            "num_instances": ("batch_size",),
            "scores": ("batch_size", max_instances),
            "classes": ("batch_size", max_instances),
            "masks": ("batch_size", max_instances, f"height/{scale}", f"width/{scale}"),
        }

    # -- shared machinery (heads/anchors.py) -------------------------------
    def get_offsets_and_scales(self, inputs):
        return anchor_lib.cell_anchors(inputs, self.levels)

    def flat_features(self, inputs):
        return anchor_lib.flatten_laterals(
            inputs, self.levels, self.laterals, self.num_channels
        )

    def _split_dynamic_weights(self, dyn):
        """dyn: (..., kernel_params) -> per-layer weights/biases."""
        c = self.mask_num_channels
        s0 = (c + 2) * c
        w1 = dyn[..., :s0].reshape(*dyn.shape[:-1], c + 2, c)
        b1 = dyn[..., s0 : s0 + c]
        s1 = s0 + c
        w2 = dyn[..., s1 : s1 + c * c].reshape(*dyn.shape[:-1], c, c)
        s2 = s1 + c * c
        b2 = dyn[..., s2 : s2 + c]
        s3 = s2 + c
        w3 = dyn[..., s3 : s3 + c].reshape(*dyn.shape[:-1], c, 1)
        b3 = dyn[..., s3 + c :]
        return w1, b1, w2, b2, w3, b3

    def _decode_masks(self, mask_feats, grid, centers, dyn_weights):
        """Dynamic 3-layer pointwise net, batched over instances.

        mask_feats: (B, H, W, c); grid: (H, W, 2) normalized coords;
        centers: (B, I, 2) instance anchor centers; dyn_weights: (B, I, P).
        Returns mask logits (B, I, H, W), computed in fp32.

        On TPU this runs as one fused Pallas pass with instances packed
        into the MXU lane dimension (``ops/pallas/dynconv.py``); elsewhere
        as the reference einsum chain.
        """
        from sihl_tpu.ops.pallas.dynconv import dynamic_pointwise_decode

        return dynamic_pointwise_decode(
            mask_feats, grid, centers, dyn_weights, self.mask_num_channels, 1
        )[..., 0]

    def _mask_grid(self, inputs):
        h, w = inputs[self.mask_level].shape[1:3]
        y_min, x_min = 1.0 / h / 2.0, 1.0 / w / 2.0
        ys = jnp.linspace(y_min, 1 - y_min, h, dtype=jnp.float32)
        xs = jnp.linspace(x_min, 1 - x_min, w, dtype=jnp.float32)
        return jnp.stack(
            [
                jnp.broadcast_to(xs[None, :], (h, w)),
                jnp.broadcast_to(ys[:, None], (h, w)),
            ],
            axis=2,
        )

    # -- inference ---------------------------------------------------------
    def __call__(self, inputs):
        batch = inputs[0].shape[0]
        flat_feats = self.flat_features(inputs)
        (loc_out,) = anchor_lib.run_mlps(
            flat_feats,
            [self.loc_head],
            num_valid=anchor_lib.num_anchors(inputs, self.levels),
        )
        loc_logits = loc_out[..., 0].astype(jnp.float32)
        num_slots = min(self.max_instances, loc_logits.shape[1])
        loc_logits, loc_idxs = jax.lax.top_k(loc_logits, num_slots)
        scores = jax.nn.sigmoid(loc_logits)
        num_instances = jnp.sum(scores > 0.5, axis=1)
        flat_feats = anchor_lib.gather_anchor_rows(flat_feats, loc_idxs)

        offsets, _ = self.get_offsets_and_scales(inputs)
        centers = offsets[:, :2][loc_idxs]  # (B, I, 2)

        mask_feats = self.mask_head(self.mask_lateral(inputs[self.mask_level]))
        grid = self._mask_grid(inputs)
        class_logits, dyn = anchor_lib.run_mlps(
            flat_feats, [self.cls_head, self.kernel_head], num_valid=flat_feats.shape[1]
        )
        masks = jax.nn.sigmoid(self._decode_masks(mask_feats, grid, centers, dyn))

        classes = jnp.argmax(class_logits, axis=2)
        if self.full_res_masks:
            b, i, h, w = masks.shape
            full = inputs[0].shape[1:3]
            masks = jax.image.resize(masks, (b, i, full[0], full[1]), method="linear")
        return num_instances, scores, classes, masks

    # -- training ----------------------------------------------------------
    def training_step(self, inputs, classes, masks) -> Tuple[jnp.ndarray, Dict]:
        """classes: (B, T) int32, -1 padding; masks: (B, T, Hm, Wm) binary
        (any resolution; scaled to absolute full-image coords internally)."""
        batch, height, width = inputs[0].shape[0], inputs[0].shape[1], inputs[0].shape[2]
        full_size = jnp.array([width, height, width, height], jnp.float32)

        # degenerate (empty-mask) instances are invalid, like reference :178
        valid = (classes >= 0) & jnp.any(masks > 0, axis=(2, 3))
        mh, mw = masks.shape[2:4]
        scale = jnp.array([width / mw, height / mh, width / mw, height / mh], jnp.float32)
        boxes = jax.vmap(masks_to_boxes)(masks.astype(jnp.float32)) * scale

        offsets, scales = self.get_offsets_and_scales(inputs)
        anchors = (offsets + scales) * full_size
        assignment, rel_iou = jax.vmap(
            lambda b, m: bbox_matching(anchors, b, m, self.topk, relative=True)
        )(boxes, valid)

        flat_feats = self.flat_features(inputs)
        (loc_out,) = anchor_lib.run_mlps(
            flat_feats,
            [self.loc_head],
            num_valid=anchor_lib.num_anchors(inputs, self.levels),
        )
        loc_logits = loc_out[..., 0].astype(jnp.float32)
        loc_target = (rel_iou == 1.0).astype(jnp.float32)
        loc_bce = binary_cross_entropy_with_logits(loc_logits, loc_target)
        loc_loss = jnp.sum(loc_bce) / jnp.maximum(jnp.sum(loc_target), 1.0)

        any_match = rel_iou.max() > 0.0

        # static-size positive gather (top rel-IoU per image)
        k = min(self.max_mask_positives, rel_iou.shape[1])
        pos_w, pos_idx = jax.lax.top_k(rel_iou, k)  # (B, k)
        pos_w, pos_idx = anchor_lib.sort_positives(pos_w, pos_idx)
        pos_feats = anchor_lib.gather_anchor_rows(flat_feats, pos_idx, sorted_unique=True)
        pos_assign = jnp.clip(jnp.take_along_axis(assignment, pos_idx, axis=1), 0, None)
        w_sum = jnp.maximum(jnp.sum(pos_w), 1e-6)

        # mask dice loss (reference :224-279)
        mask_feats = self.mask_head(self.mask_lateral(inputs[self.mask_level]))
        grid = self._mask_grid(inputs)
        centers = offsets[:, :2][pos_idx]  # (B, k, 2)
        class_logits, dyn = anchor_lib.run_mlps(
            pos_feats, [self.cls_head, self.kernel_head], num_valid=pos_feats.shape[1]
        )
        mask_logits = self._decode_masks(mask_feats, grid, centers, dyn)
        mask_preds = jax.nn.sigmoid(mask_logits)  # (B, k, h, w)

        target_masks = jnp.take_along_axis(
            masks.astype(jnp.float32), pos_assign[..., None, None], axis=1
        )  # (B, k, Hm, Wm)
        ph, pw = mask_preds.shape[2:]
        bk = batch * k
        target_masks = jax.image.resize(
            target_masks.reshape(bk, mh, mw), (bk, ph, pw), method="linear"
        ).reshape(batch, k, ph, pw)

        numerator = jnp.sum(mask_preds * target_masks, axis=(2, 3))
        denominator = jnp.sum(mask_preds**2 + target_masks**2, axis=(2, 3))
        dice = 1.0 - 2.0 * numerator / jnp.maximum(denominator, 1e-6)
        mask_loss = jnp.sum(pos_w * dice) / w_sum

        # classification loss
        class_target = jnp.take_along_axis(jnp.clip(classes, 0, None), pos_assign, axis=1)
        class_ce = cross_entropy(class_logits, class_target)
        class_loss = jnp.sum(pos_w * class_ce) / w_sum

        mask_loss = jnp.where(any_match, mask_loss, 0.0)
        class_loss = jnp.where(any_match, class_loss, 0.0)
        loss = loc_loss + 10.0 * mask_loss + class_loss
        return loss, {
            "location_loss": loc_loss,
            "mask_loss": mask_loss,
            "class_loss": class_loss,
        }

    # -- validation --------------------------------------------------------
    def metrics_init(self):
        return {"loss": M.mean_init()}

    def validation_step(self, state, inputs, classes, masks):
        num_instances, scores, pred_classes, pred_masks = self(inputs)
        loss, _ = self.training_step(inputs, classes, masks)
        state = {"loss": M.mean_update(state["loss"], loss)}
        # binary masks cross device->host bit-packed (1/8th the transfer;
        # VERDICT r1 "validation transfer diet")
        aux = {
            "scores": scores,
            "pred_classes": pred_classes,
            "pred_masks_bits": packbits_last(pred_masks > 0.5),
            "pred_masks_width": pred_masks.shape[-1],
            "gt_classes": classes,
            "gt_masks_bits": packbits_last(masks > 0),
            "gt_masks_width": masks.shape[-1],
        }
        return state, loss, aux

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        import numpy as np

        out = {"loss": float(M.mean_compute(state["loss"]))}
        acc = MeanAveragePrecisionAccumulator(iou_type="segm")
        for aux in collected:
            pred = np.unpackbits(
                np.asarray(aux["pred_masks_bits"]), axis=-1, bitorder="little"
            )[..., : int(aux["pred_masks_width"])]
            gt = np.unpackbits(
                np.asarray(aux["gt_masks_bits"]), axis=-1, bitorder="little"
            )[..., : int(aux["gt_masks_width"])]
            acc.update(
                pred, aux["pred_classes"], aux["scores"], gt, aux["gt_classes"]
            )
        out.update(acc.compute())
        return out

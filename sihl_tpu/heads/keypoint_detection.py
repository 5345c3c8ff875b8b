"""FCPose-style keypoint detection head (reference
``src/sihl/heads/keypoint_detection.py``): same dynamic-kernel trick as
instance segmentation but with c=32 channels and K heatmap outputs; spatial
softmax cross-entropy against one-hot keypoint heatmaps; a presence head
predicts per-keypoint visibility.

TPU-native restructuring mirrors :mod:`instance_segmentation`: vmapped
matching over padded targets, decomposed first-layer einsum, static-size
positive gathers.  The argmax decode fixes the reference's row/col mix-up
(``//``/``%`` both used ``mask_height``, reference :167) — correct for
square maps, wrong otherwise.

Targets: ``keypoints (B, T, K, 2)`` absolute xy, ``presence (B, T, K)``
bool; padded instances have all-false presence.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.heads import anchors as anchor_lib
from sihl_tpu.heads.base import Head
from sihl_tpu.layers.convblocks import StandardConvNormAct, _rngs
from sihl_tpu.layers.mlp import MLP
from sihl_tpu.ops.boxes import bbox_matching
from sihl_tpu.ops.losses import binary_cross_entropy_with_logits
from sihl_tpu.training import metrics as M
from sihl_tpu.utils.pck import PercentageOfCorrectKeypoints

import numpy as np


class KeypointDetection(Head):
    """https://arxiv.org/abs/2105.14185 (FCPose)."""

    def __init__(
        self,
        in_channels: List[int],
        num_keypoints: int,
        mask_level: int = 3,
        bottom_level: int = 5,
        top_level: int = 5,
        num_channels: int = 256,
        num_layers: int = 4,
        max_instances: int = 100,
        max_targets: int = 100,
        max_mask_positives: int = 128,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ) -> None:
        assert num_keypoints > 0
        assert len(in_channels) > top_level
        assert 0 < bottom_level <= top_level
        assert num_channels % 4 == 0
        rngs = _rngs(rngs)

        self.in_channels = in_channels
        self.num_keypoints = num_keypoints
        self.mask_level = mask_level
        self.bottom_level, self.top_level = bottom_level, top_level
        self.levels = range(bottom_level, top_level + 1)
        self.num_channels = num_channels
        self.max_instances = max_instances
        self.max_targets = max_targets
        self.max_mask_positives = max_mask_positives
        self.topk = 9

        self.laterals = nnx.List(
            StandardConvNormAct(in_channels[level], num_channels, 1, act=None, rngs=rngs)
            for level in self.levels
        )
        hidden = [num_channels] * num_layers
        self.loc_head = MLP(num_channels, hidden + [1], final_bias_init=-5.0, rngs=rngs)
        self.presence_head = MLP(num_channels, hidden + [num_keypoints], rngs=rngs)

        c = self.mask_num_channels = 32
        kernel_params = (
            (c + 2) * c + c + c * c + c + c * num_keypoints + num_keypoints
        )
        self.kernel_head = MLP(num_channels, hidden + [kernel_params], rngs=rngs)
        self.mask_lateral = StandardConvNormAct(
            in_channels[mask_level], num_channels, 1, act=None, rngs=rngs
        )
        self.mask_head = StandardConvNormAct(num_channels, c, 3, act="silu", rngs=rngs)

        self.output_shapes = {
            "num_instances": ("batch_size",),
            "scores": ("batch_size", max_instances),
            "presence": ("batch_size", max_instances, num_keypoints),
            "keypoints": ("batch_size", max_instances, num_keypoints, 2),
        }

    # -- shared machinery (heads/anchors.py) -------------------------------
    def get_offsets_and_scales(self, inputs):
        return anchor_lib.cell_anchors(inputs, self.levels)

    def flat_features(self, inputs):
        return anchor_lib.flatten_laterals(
            inputs, self.levels, self.laterals, self.num_channels
        )

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

    def _split_dynamic_weights(self, dyn):
        c = self.mask_num_channels
        k = self.num_keypoints
        s0 = (c + 2) * c
        w1 = dyn[..., :s0].reshape(*dyn.shape[:-1], c + 2, c)
        b1 = dyn[..., s0 : s0 + c]
        s1 = s0 + c
        w2 = dyn[..., s1 : s1 + c * c].reshape(*dyn.shape[:-1], c, c)
        s2 = s1 + c * c
        b2 = dyn[..., s2 : s2 + c]
        s3 = s2 + c
        w3 = dyn[..., s3 : s3 + c * k].reshape(*dyn.shape[:-1], c, k)
        b3 = dyn[..., s3 + c * k :]
        return w1, b1, w2, b2, w3, b3

    def _decode_heatmaps(self, mask_feats, grid, centers, dyn_weights):
        """(B, I, H, W, K) heatmap logits in fp32.

        Fused Pallas pass on TPU (``ops/pallas/dynconv.py``), reference
        einsum chain elsewhere."""
        from sihl_tpu.ops.pallas.dynconv import dynamic_pointwise_decode

        return dynamic_pointwise_decode(
            mask_feats, grid, centers, dyn_weights,
            self.mask_num_channels, self.num_keypoints,
        )

    # -- inference ---------------------------------------------------------
    def __call__(self, inputs, output_heatmaps: bool = False):
        batch, full_h, full_w = inputs[0].shape[0], inputs[0].shape[1], inputs[0].shape[2]
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
        centers = offsets[:, :2][loc_idxs]
        mask_feats = self.mask_head(self.mask_lateral(inputs[self.mask_level]))
        grid = self._mask_grid(inputs)
        presence_out, dyn = anchor_lib.run_mlps(
            flat_feats, [self.presence_head, self.kernel_head], num_valid=flat_feats.shape[1]
        )
        heatmaps = self._decode_heatmaps(mask_feats, grid, centers, dyn)
        b, i, mh, mw, k = heatmaps.shape

        if output_heatmaps:
            flat = heatmaps.reshape(b, i, mh * mw, k)
            return jax.nn.softmax(flat, axis=2).reshape(b, i, mh, mw, k)

        flat = heatmaps.reshape(b, i, mh * mw, k)
        flat_idxs = jnp.argmax(flat, axis=2)  # (B, I, K)
        kpts_y = (flat_idxs // mw).astype(jnp.float32)
        kpts_x = (flat_idxs % mw).astype(jnp.float32)
        kpts_y = (kpts_y + 0.5) / mh * full_h
        kpts_x = (kpts_x + 0.5) / mw * full_w
        keypoints = jnp.stack([kpts_x, kpts_y], axis=3)
        presence = jax.nn.sigmoid(presence_out.astype(jnp.float32))
        return num_instances, scores, presence, keypoints

    def get_saliency(self, inputs):
        heatmaps = self(inputs, output_heatmaps=True)
        return jnp.max(heatmaps, axis=(1, 4))

    # -- training ----------------------------------------------------------
    @staticmethod
    def keypoints_to_boxes(keypoints, presence):
        """Enclosing box of visible keypoints per instance (reference :349-358)."""
        inf = jnp.float32(jnp.inf)
        masked = jnp.where(presence[..., None], keypoints, inf)
        xmin = jnp.min(masked[..., 0], axis=-1)
        ymin = jnp.min(masked[..., 1], axis=-1)
        masked = jnp.where(presence[..., None], keypoints, -inf)
        xmax = jnp.max(masked[..., 0], axis=-1)
        ymax = jnp.max(masked[..., 1], axis=-1)
        boxes = jnp.stack([xmin, ymin, xmax, ymax], axis=-1)
        any_vis = jnp.any(presence, axis=-1)[..., None]
        return jnp.where(any_vis, boxes, 0.0)

    def keypoints_to_heatmaps(self, keypoints, presence, height, width, img_h, img_w):
        """One-hot target heatmaps (..., K, h, w) (reference :360-378)."""
        xs = jnp.clip(
            jnp.round(keypoints[..., 0] * (width - 1) / (img_w - 1)), 0, width - 1
        ).astype(jnp.int32)
        ys = jnp.clip(
            jnp.round(keypoints[..., 1] * (height - 1) / (img_h - 1)), 0, height - 1
        ).astype(jnp.int32)
        one_x = jax.nn.one_hot(xs, width, dtype=jnp.float32)
        one_y = jax.nn.one_hot(ys, height, dtype=jnp.float32)
        heat = one_y[..., :, None] * one_x[..., None, :]  # (..., K, h, w)
        return heat * presence[..., None, None]

    def training_step(self, inputs, keypoints, presence) -> Tuple[jnp.ndarray, Dict]:
        batch, full_h, full_w = inputs[0].shape[0], inputs[0].shape[1], inputs[0].shape[2]

        valid = jnp.any(presence, axis=2)  # (B, T)
        boxes = self.keypoints_to_boxes(keypoints.astype(jnp.float32), presence)

        offsets, scales = self.get_offsets_and_scales(inputs)
        full_size = jnp.array([full_w, full_h, full_w, full_h], jnp.float32)
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

        k = min(self.max_mask_positives, rel_iou.shape[1])
        pos_w, pos_idx = jax.lax.top_k(rel_iou, k)
        pos_w, pos_idx = anchor_lib.sort_positives(pos_w, pos_idx)
        pos_feats = anchor_lib.gather_anchor_rows(flat_feats, pos_idx, sorted_unique=True)
        pos_assign = jnp.clip(jnp.take_along_axis(assignment, pos_idx, axis=1), 0, None)
        w_sum = jnp.maximum(jnp.sum(pos_w), 1e-6)

        # presence loss
        presence_out, dyn = anchor_lib.run_mlps(
            pos_feats, [self.presence_head, self.kernel_head], num_valid=pos_feats.shape[1]
        )
        presence_logits = presence_out.astype(jnp.float32)
        target_presence = jnp.take_along_axis(
            presence.astype(jnp.float32), pos_assign[..., None], axis=1
        )
        p_bce = binary_cross_entropy_with_logits(presence_logits, target_presence)
        presence_loss = jnp.sum(pos_w[..., None] * p_bce) / w_sum

        # keypoint heatmap loss: spatial softmax CE per keypoint channel
        mask_feats = self.mask_head(self.mask_lateral(inputs[self.mask_level]))
        grid = self._mask_grid(inputs)
        centers = offsets[:, :2][pos_idx]
        heat_logits = self._decode_heatmaps(mask_feats, grid, centers, dyn)
        b_, i_, mh, mw, nk = heat_logits.shape

        target_kpts = jnp.take_along_axis(
            keypoints.astype(jnp.float32), pos_assign[..., None, None], axis=1
        )  # (B, k, K, 2)
        target_heat = self.keypoints_to_heatmaps(
            target_kpts, target_presence, mh, mw, full_h, full_w
        )  # (B, k, K, mh, mw)

        log_probs = jax.nn.log_softmax(
            heat_logits.reshape(b_, i_, mh * mw, nk), axis=2
        )
        target_flat = target_heat.transpose(0, 1, 3, 4, 2).reshape(b_, i_, mh * mw, nk)
        kp_ce = -jnp.sum(target_flat * log_probs, axis=2)  # (B, k, K)
        keypoint_loss = jnp.sum(pos_w[..., None] * kp_ce) / w_sum

        presence_loss = jnp.where(any_match, presence_loss, 0.0)
        keypoint_loss = jnp.where(any_match, keypoint_loss, 0.0)
        loss = loc_loss + keypoint_loss + presence_loss
        return loss, {
            "location_loss": loc_loss,
            "keypoint_loss": keypoint_loss,
            "presence_loss": presence_loss,
        }

    # -- validation --------------------------------------------------------
    def metrics_init(self):
        return {"loss": M.mean_init()}

    def validation_step(self, state, inputs, keypoints, presence):
        num_instances, scores, pred_presence, pred_keypoints = self(inputs)
        loss, _ = self.training_step(inputs, keypoints, presence)
        state = {"loss": M.mean_update(state["loss"], loss)}
        full = jnp.array([inputs[0].shape[2], inputs[0].shape[1]], jnp.float32)
        aux = {
            "num_instances": num_instances,
            "pred_presence": pred_presence,
            "pred_keypoints": pred_keypoints / full,
            "gt_keypoints": keypoints / full,
            "gt_presence": presence,
        }
        return state, loss, aux

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        pck = PercentageOfCorrectKeypoints(threshold=0.05)
        for aux in collected:
            n = np.asarray(aux["num_instances"])
            for b in range(len(n)):
                gt_valid = np.asarray(aux["gt_presence"][b]).any(axis=1)
                pck.update(
                    np.asarray(aux["pred_keypoints"][b])[: n[b]],
                    np.asarray(aux["pred_presence"][b])[: n[b]],
                    np.asarray(aux["gt_keypoints"][b])[gt_valid],
                    np.asarray(aux["gt_presence"][b])[gt_valid],
                )
        metrics = pck.compute()
        metrics["loss"] = float(M.mean_compute(state["loss"]))
        return metrics

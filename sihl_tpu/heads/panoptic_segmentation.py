"""Panoptic segmentation head.

The reference deleted its implementation (import commented at
``src/sihl/heads/__init__.py:15``); only the example's intended API
survives (``examples/panoptic_segmentation.py:446-453``):
``PanopticSegmentation(in_channels, num_stuff_classes, num_thing_classes,
mask_top_level, soft_label_decay_steps, ignore_index)`` trained against a
2-plane target (semantic map + instance-id map, example :377-386).

This is therefore a reconstruction in sihl's house style, composed from the
two machines the library already has:

* a PP-LiteSeg **semantic** decoder over stuff+thing classes
  (:class:`SemanticSegmentation`),
* a CondInst **instance** branch over thing classes
  (:class:`InstanceSegmentation`),
* fixed-shape on-device **panoptic fusion** at inference: instances are
  pasted in descending score order over the semantic argmax, producing a
  class map and an instance-id map.

``soft_label_decay_steps`` linearly decays semantic label smoothing from
0.1 to 0 over that many steps (tracked by an on-device step counter).

Targets (padded): ``semantic (B, H, W)`` int (stuff then thing classes;
``ignore_index`` for void), ``classes (B, T)`` thing-class ids (-1 padded),
``masks (B, T, Hm, Wm)`` per-instance binary masks.  The helper
:func:`panoptic_targets_from_maps` converts the example's 2-plane format.
"""

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sihl_tpu.heads.base import Head
from sihl_tpu.heads.instance_segmentation import InstanceSegmentation
from sihl_tpu.heads.semantic_segmentation import SemanticSegmentation
from sihl_tpu.layers.convblocks import _rngs
from sihl_tpu.ops.image import interpolate, packbits_last
from sihl_tpu.ops.losses import cross_entropy
from sihl_tpu.training import metrics as M
from sihl_tpu.utils.panoptic_quality import PanopticQuality


def panoptic_targets_from_maps(
    semantic_map: np.ndarray,
    id_map: np.ndarray,
    num_stuff_classes: int,
    max_targets: int,
    ignore_index: int = -100,
):
    """Host-side conversion of the example's 2-plane target into padded
    head targets (numpy; for the input pipeline)."""
    thing_region = (semantic_map >= num_stuff_classes) & (semantic_map != ignore_index)
    classes = np.full((max_targets,), -1, np.int64)
    masks = np.zeros((max_targets,) + id_map.shape, np.float32)
    ids = np.unique(id_map[thing_region])
    for t, seg_id in enumerate(ids[:max_targets]):
        sel = (id_map == seg_id) & thing_region
        cls_vals, counts = np.unique(semantic_map[sel], return_counts=True)
        classes[t] = int(cls_vals[np.argmax(counts)]) - num_stuff_classes
        masks[t] = sel
    return classes, masks


class PanopticSegmentation(Head):
    def __init__(
        self,
        in_channels: List[int],
        num_stuff_classes: int,
        num_thing_classes: int,
        bottom_level: int = 3,
        top_level: int = 5,
        mask_top_level: int = 5,
        mask_level: int = 3,
        num_channels: int = 256,
        num_layers: int = 4,
        max_instances: int = 100,
        max_targets: int = 100,
        soft_label_decay_steps: int = 0,
        ignore_index: int = -100,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        assert num_stuff_classes >= 0 and num_thing_classes > 0
        rngs = _rngs(rngs)
        self.num_stuff_classes = num_stuff_classes
        self.num_thing_classes = num_thing_classes
        self.ignore_index = ignore_index
        self.soft_label_decay_steps = soft_label_decay_steps
        self.max_instances = max_instances
        self.semantic = SemanticSegmentation(
            in_channels,
            num_stuff_classes + num_thing_classes,
            bottom_level=bottom_level,
            top_level=mask_top_level,
            num_channels=num_channels,
            num_layers=max(num_layers - 2, 1),
            ignore_index=ignore_index,
            rngs=rngs,
        )
        self.instance = InstanceSegmentation(
            in_channels,
            num_thing_classes,
            mask_level=mask_level,
            bottom_level=bottom_level,
            top_level=top_level,
            num_channels=num_channels,
            num_layers=num_layers,
            max_instances=max_instances,
            max_targets=max_targets,
            rngs=rngs,
        )
        self.step_counter = nnx.Variable(jnp.zeros((), jnp.int32))

        scale = 2**mask_level
        self.output_shapes = {
            "class_maps": ("batch_size", f"height/{scale}", f"width/{scale}"),
            "instance_maps": ("batch_size", f"height/{scale}", f"width/{scale}"),
            "num_instances": ("batch_size",),
            "scores": ("batch_size", max_instances),
            "classes": ("batch_size", max_instances),
        }

    # -- inference: panoptic fusion ---------------------------------------
    def __call__(self, inputs):
        sem_logits = self.semantic.get_logits(inputs)  # (B, hs, ws, S+T)
        num_instances, scores, inst_classes, inst_masks = self.instance(inputs)
        b, i, mh, mw = inst_masks.shape
        sem_logits = interpolate(sem_logits, size=(mh, mw), mode="bilinear")
        sem_classes = jnp.argmax(sem_logits.astype(jnp.float32), axis=-1)

        # paste instances in descending-score order (scores are pre-sorted):
        # iterate from lowest to highest priority so better scores overwrite
        class_map = sem_classes.astype(jnp.int32)
        id_map = jnp.zeros((b, mh, mw), jnp.int32)

        def body(k, carry):
            class_map, id_map = carry
            idx = i - 1 - k  # ascending priority
            live = (scores[:, idx] > 0.5)[:, None, None]
            claim = (inst_masks[:, idx] > 0.5) & live
            class_map = jnp.where(
                claim, inst_classes[:, idx, None, None] + self.num_stuff_classes,
                class_map,
            ).astype(jnp.int32)
            id_map = jnp.where(claim, idx + 1, id_map)
            return class_map, id_map

        class_map, id_map = jax.lax.fori_loop(0, i, body, (class_map, id_map))
        return class_map, id_map, num_instances, scores, inst_classes

    # -- training ----------------------------------------------------------
    def _label_smoothing(self):
        if self.soft_label_decay_steps <= 0:
            return 0.0
        frac = jnp.clip(
            1.0 - self.step_counter[...] / self.soft_label_decay_steps, 0.0, 1.0
        )
        return 0.1 * frac

    def training_step(self, inputs, semantic, classes, masks):
        smoothing = self._label_smoothing()
        self.step_counter[...] = self.step_counter[...] + 1

        sem_logits = interpolate(
            self.semantic.get_logits(inputs), size=semantic.shape[1:3]
        )
        ce = cross_entropy(
            sem_logits, semantic, label_smoothing=smoothing,
            ignore_index=self.ignore_index,
        )
        valid = (semantic != self.ignore_index).astype(jnp.float32)
        semantic_loss = jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1.0)

        instance_loss, inst_metrics = self.instance.training_step(
            inputs, classes, masks
        )
        loss = semantic_loss + instance_loss
        metrics = {"semantic_loss": semantic_loss}
        metrics.update(inst_metrics)
        return loss, metrics

    # -- validation --------------------------------------------------------
    def metrics_init(self):
        return {
            "loss": M.mean_init(),
            "seg": M.segmentation_init(self.num_stuff_classes + self.num_thing_classes),
        }

    def validation_step(self, state, inputs, semantic, classes, masks):
        loss, _ = self.training_step(inputs, semantic, classes, masks)
        self.step_counter[...] = self.step_counter[...] - 1  # don't count val
        class_map, id_map, num_instances, scores, inst_classes = self(inputs)
        sem_small = interpolate(
            semantic[..., None].astype(jnp.float32),
            size=class_map.shape[1:3],
            mode="nearest",
        )[..., 0].astype(jnp.int32)
        state = {
            "loss": M.mean_update(state["loss"], loss),
            "seg": M.segmentation_update(
                state["seg"], class_map, sem_small, ignore_index=self.ignore_index
            ),
        }
        aux = {
            "class_map": class_map,
            "id_map": id_map,
            "gt_semantic": sem_small,
            "gt_classes": classes,
            # bit-packed device->host transfer (1/8th the bytes)
            "gt_masks_bits": packbits_last(masks > 0),
            "gt_masks_width": masks.shape[-1],
        }
        return state, loss, aux

    def validation_end(self, state, collected=()) -> Dict[str, float]:
        seg = M.segmentation_compute(state["seg"])
        out = {
            "loss": float(M.mean_compute(state["loss"])),
            "semantic_mean_iou": float(seg["mean_iou"]),
        }
        pq = PanopticQuality(self.num_stuff_classes, self.ignore_index)
        for aux in collected:
            class_map = np.asarray(aux["class_map"])
            id_map = np.asarray(aux["id_map"])
            gt_sem = np.asarray(aux["gt_semantic"])
            gt_classes = np.asarray(aux["gt_classes"])
            gt_masks = np.unpackbits(
                np.asarray(aux["gt_masks_bits"]), axis=-1, bitorder="little"
            )[..., : int(aux["gt_masks_width"])]
            for b in range(class_map.shape[0]):
                gt_ids = np.zeros_like(id_map[b])
                h, w = gt_ids.shape
                for t in range(gt_classes.shape[1]):
                    if gt_classes[b, t] < 0:
                        continue
                    m = gt_masks[b, t]
                    ys = (np.arange(h) * (m.shape[0] / h)).astype(np.int64)
                    xs = (np.arange(w) * (m.shape[1] / w)).astype(np.int64)
                    gt_ids[m[ys][:, xs]] = t + 1
                pq.update(class_map[b], id_map[b], gt_sem[b], gt_ids)
        out.update(pq.compute())
        return out

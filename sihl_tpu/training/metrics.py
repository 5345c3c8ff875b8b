"""On-device metric accumulators.

The reference builds torchmetrics objects per validation epoch and reduces
them at epoch end (e.g. ``src/sihl/heads/multiclass_classification.py:73-97``).
Here each metric is a pure (init, update, compute) triple over a small pytree
state of sums — so updates run *inside* the jitted validation step, and
multi-chip reduction is a plain ``psum``/cross-device sum of states
(replacing torchmetrics' process-group sync, SURVEY.md §5.8).
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# mean (torchmetrics MeanMetric with nan_strategy="ignore")


def mean_init():
    return {"total": jnp.zeros((), jnp.float32), "count": jnp.zeros((), jnp.float32)}


def mean_update(state, value, weight=1.0):
    value = jnp.asarray(value, jnp.float32)
    ok = jnp.isfinite(value)
    return {
        "total": state["total"] + jnp.where(ok, value * weight, 0.0),
        "count": state["count"] + jnp.where(ok, weight, 0.0),
    }


def mean_compute(state):
    return state["total"] / jnp.maximum(state["count"], 1e-12)


# --------------------------------------------------------------------------
# multiclass confusion-based metrics


def confusion_init(num_classes: int):
    return {"confusion": jnp.zeros((num_classes, num_classes), jnp.float32)}


def confusion_update(state, preds, targets):
    """preds: (N,) int predicted class; targets: (N,) int true class."""
    num_classes = state["confusion"].shape[0]
    idx = targets * num_classes + preds
    flat = jnp.zeros((num_classes * num_classes,), jnp.float32).at[idx].add(1.0)
    return {"confusion": state["confusion"] + flat.reshape(num_classes, num_classes)}


def confusion_compute(state) -> Dict[str, jnp.ndarray]:
    cm = state["confusion"]  # rows: true, cols: pred
    total = jnp.maximum(jnp.sum(cm), 1e-12)
    tp = jnp.diagonal(cm)
    pred_pos = jnp.sum(cm, axis=0)
    true_pos = jnp.sum(cm, axis=1)
    accuracy = jnp.sum(tp) / total
    # macro-averaged over classes present in either preds or targets
    precision_c = tp / jnp.maximum(pred_pos, 1e-12)
    recall_c = tp / jnp.maximum(true_pos, 1e-12)
    present = (true_pos > 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(present), 1.0)
    return {
        "accuracy": accuracy,
        "precision": jnp.sum(precision_c * present) / denom,
        "recall": jnp.sum(recall_c * present) / denom,
    }


# --------------------------------------------------------------------------
# multilabel / binary micro metrics


def binary_stats_init():
    z = jnp.zeros((), jnp.float32)
    return {"tp": z, "fp": z, "fn": z, "tn": z}


def binary_stats_update(state, pred_pos, true_pos):
    """pred_pos / true_pos: same-shape boolean arrays of label decisions."""
    pred_pos = pred_pos.astype(jnp.float32)
    true_pos = true_pos.astype(jnp.float32)
    return {
        "tp": state["tp"] + jnp.sum(pred_pos * true_pos),
        "fp": state["fp"] + jnp.sum(pred_pos * (1 - true_pos)),
        "fn": state["fn"] + jnp.sum((1 - pred_pos) * true_pos),
        "tn": state["tn"] + jnp.sum((1 - pred_pos) * (1 - true_pos)),
    }


def binary_stats_compute(state) -> Dict[str, jnp.ndarray]:
    tp, fp, fn, tn = state["tp"], state["fp"], state["fn"], state["tn"]
    return {
        "accuracy": (tp + tn) / jnp.maximum(tp + tn + fp + fn, 1e-12),
        "precision": tp / jnp.maximum(tp + fp, 1e-12),
        "recall": tp / jnp.maximum(tp + fn, 1e-12),
    }


# --------------------------------------------------------------------------
# regression metrics (MAE / MSE / R^2), accumulated from sums


def regression_init():
    z = jnp.zeros((), jnp.float32)
    return {
        "abs_err": z, "sq_err": z, "sum_y": z, "sum_y2": z, "count": z,
    }


def regression_update(state, preds, targets, mask=None):
    preds = preds.astype(jnp.float32).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    w = (
        jnp.ones_like(targets)
        if mask is None
        else mask.astype(jnp.float32).reshape(-1)
    )
    return {
        "abs_err": state["abs_err"] + jnp.sum(w * jnp.abs(preds - targets)),
        "sq_err": state["sq_err"] + jnp.sum(w * (preds - targets) ** 2),
        "sum_y": state["sum_y"] + jnp.sum(w * targets),
        "sum_y2": state["sum_y2"] + jnp.sum(w * targets**2),
        "count": state["count"] + jnp.sum(w),
    }


def regression_compute(state) -> Dict[str, jnp.ndarray]:
    n = jnp.maximum(state["count"], 1e-12)
    ss_tot = state["sum_y2"] - state["sum_y"] ** 2 / n
    return {
        "mean_absolute_error": state["abs_err"] / n,
        "mean_squared_error": state["sq_err"] / n,
        "r_squared": 1.0 - state["sq_err"] / jnp.maximum(ss_tot, 1e-12),
    }


# --------------------------------------------------------------------------
# dense segmentation metrics (jaccard / pixel accuracy) via confusion matrix


def segmentation_init(num_classes: int):
    return confusion_init(num_classes)


def segmentation_update(state, preds, targets, ignore_index=None):
    """preds/targets: integer maps of any matching shape."""
    num_classes = state["confusion"].shape[0]
    preds = preds.reshape(-1)
    targets = targets.reshape(-1)
    if ignore_index is not None:
        valid = targets != ignore_index
        weight = valid.astype(jnp.float32)
        targets = jnp.where(valid, targets, 0)
    else:
        weight = jnp.ones(targets.shape, jnp.float32)
    idx = targets * num_classes + preds
    flat = jnp.zeros((num_classes * num_classes,), jnp.float32).at[idx].add(weight)
    return {"confusion": state["confusion"] + flat.reshape(num_classes, num_classes)}


def segmentation_compute(state) -> Dict[str, jnp.ndarray]:
    cm = state["confusion"]
    tp = jnp.diagonal(cm)
    union = jnp.sum(cm, axis=0) + jnp.sum(cm, axis=1) - tp
    present = (jnp.sum(cm, axis=1) > 0).astype(jnp.float32)
    iou_c = tp / jnp.maximum(union, 1e-12)
    return {
        "accuracy": jnp.sum(tp) / jnp.maximum(jnp.sum(cm), 1e-12),
        "mean_iou": jnp.sum(iou_c * present) / jnp.maximum(jnp.sum(present), 1.0),
    }


# --------------------------------------------------------------------------
# helpers


def tree_psum(tree, axis_name: str):
    """Cross-device reduction of a metric state inside shard_map/pmap."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), tree)


def tree_add(a, b):
    """Host-side merge of per-shard metric states."""
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)

"""Optimizer/schedule factory replacing ``configure_optimizers``
(reference ``src/sihl/lightning_module.py:179-245``).

Reproduced semantics:

* ``backbone_lr_factor`` — backbone params get ``lr * factor``
  (reference :185-194),
* weight-decay blacklist when ``weight_decay`` is set — biases and
  norm/embedding params are exempt (reference :196-222),
* optional warmup: linear 0.01→1 over ``warmup`` steps prepended to the
  main schedule with per-step stepping (reference :226-244),
* frozen backbone levels receive zero updates (the reference does this
  with ``requires_grad_(False)``; here it is an optimizer mask).

Implemented as one ``optax.multi_transform`` over four labels
(``{backbone|rest} x {decay|no_decay}`` + ``frozen``), each an inner
optimizer sharing the global schedule.
"""

from typing import Any, Callable, Dict, Optional

import jax
import optax


def make_schedule(
    learning_rate: float,
    scheduler: Optional[str] = None,
    scheduler_kwargs: Optional[Dict[str, Any]] = None,
) -> Callable:
    """Build a per-step optax schedule mirroring the torch schedulers the
    reference examples use (MultiStepLR / OneCycleLR / CosineAnnealingLR)."""
    kwargs = dict(scheduler_kwargs or {})
    warmup = kwargs.pop("warmup", None)

    if scheduler is None or scheduler == "constant":
        main = optax.constant_schedule(learning_rate)
    elif scheduler == "multistep":
        milestones = kwargs.pop("milestones")
        gamma = kwargs.pop("gamma", 0.1)
        boundaries = {int(m): gamma for m in milestones}
        main = optax.piecewise_constant_schedule(learning_rate, boundaries)
    elif scheduler == "cosine":
        decay_steps = kwargs.pop("T_max", None) or kwargs.pop("decay_steps")
        eta_min = kwargs.pop("eta_min", 0.0)
        main = optax.cosine_decay_schedule(
            learning_rate, decay_steps, alpha=eta_min / max(learning_rate, 1e-12)
        )
    elif scheduler == "onecycle":
        total_steps = kwargs.pop("total_steps")
        max_lr = kwargs.pop("max_lr", learning_rate)
        main = optax.cosine_onecycle_schedule(
            total_steps,
            max_lr,
            pct_start=kwargs.pop("pct_start", 0.3),
            div_factor=kwargs.pop("div_factor", 25.0),
            final_div_factor=kwargs.pop("final_div_factor", 1e4),
        )
    elif callable(scheduler):
        main = scheduler
    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")

    if warmup:
        warm = optax.linear_schedule(learning_rate * 0.01, learning_rate, warmup)
        return optax.join_schedules([warm, main], [warmup])
    return main


def _is_no_decay(path) -> bool:
    """Weight-decay blacklist by param path: biases and norm/embedding
    scales (the reference blacklists bias params and LayerNorm/GroupNorm/
    BatchNorm2d/Embedding modules, :198-207)."""
    leaf = str(path[-1]) if path else ""
    return leaf in ("bias", "scale", "embedding")


def make_optimizer(
    param_labels,
    optimizer: str = "adam",
    optimizer_kwargs: Optional[Dict[str, Any]] = None,
    scheduler: Optional[str] = None,
    scheduler_kwargs: Optional[Dict[str, Any]] = None,
    grad_clip: Optional[float] = None,
):
    """Build (tx, schedule_fn).

    ``param_labels`` is a pytree (matching the params state) of strings in
    {"rest_decay", "rest_no_decay", "backbone_decay", "backbone_no_decay",
    "frozen"}.
    """
    kwargs = dict(optimizer_kwargs or {})
    lr = kwargs.pop("lr", 1e-3)
    backbone_lr_factor = kwargs.pop("backbone_lr_factor", 1.0)
    weight_decay = kwargs.pop("weight_decay", None)
    schedule = make_schedule(lr, scheduler, scheduler_kwargs)

    def base_opt(lr_scale: float, decay: Optional[float]):
        scaled = lambda step: schedule(step) * lr_scale
        if optimizer in ("adamw", "adam") and decay:
            return optax.adamw(scaled, weight_decay=decay, **kwargs)
        if optimizer in ("adam", "adamw"):
            return optax.adam(scaled, **kwargs)
        if optimizer == "sgd":
            return optax.sgd(scaled, **kwargs)
        if optimizer == "lamb":
            return optax.lamb(scaled, weight_decay=decay or 0.0, **kwargs)
        raise ValueError(f"unknown optimizer {optimizer!r}")

    transforms = {
        "rest_decay": base_opt(1.0, weight_decay),
        "rest_no_decay": base_opt(1.0, None),
        "backbone_decay": base_opt(backbone_lr_factor, weight_decay),
        "backbone_no_decay": base_opt(backbone_lr_factor, None),
        "frozen": optax.set_to_zero(),
    }
    tx = optax.multi_transform(transforms, param_labels)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx, schedule


def label_params(params_state, is_backbone_path, is_frozen_path) -> Any:
    """Label function for ``optax.multi_transform``: derives each leaf's
    label from its path in the updates pytree (structure-agnostic, so it
    works on nnx State trees whose leaves are Variable nodes)."""

    def label_for(path):
        if is_frozen_path(path):
            return "frozen"
        backbone = "backbone" if is_backbone_path(path) else "rest"
        decay = "no_decay" if _is_no_decay(path) else "decay"
        return f"{backbone}_{decay}"

    def labels_fn(updates):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: label_for(_path_keys(p)), updates
        )

    return labels_fn


def _path_keys(path) -> tuple:
    keys = []
    for entry in path:
        if hasattr(entry, "key"):
            keys.append(entry.key)
        elif hasattr(entry, "idx"):
            keys.append(entry.idx)
        elif hasattr(entry, "name"):
            keys.append(entry.name)
        else:
            keys.append(str(entry))
    # nnx Variable pytree nodes contribute a trailing value-accessor key;
    # strip it so leaf-name rules ("bias", "scale") see the param name.
    while keys and str(keys[-1]) in ("value", "raw_value", "_raw_value"):
        keys.pop()
    return tuple(keys)

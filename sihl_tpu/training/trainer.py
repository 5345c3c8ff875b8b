"""Training runtime replacing ``SihlLightningModule``
(reference ``src/sihl/lightning_module.py``).

The whole of the reference's per-step work — feature extraction, per-head
losses, backward, optimizer, metric updates — compiles into **one** jitted
XLA program (SURVEY.md §7): bf16-friendly compute, fp32 losses, global-
batch BatchNorm, and data parallelism by sharding the batch over a mesh's
``data`` axis (gradients reduce over ICI automatically because params are
replicated and the batch is sharded).

Orchestration kept host-side, mirroring the reference:

* multitask = list of heads, losses summed (reference :107),
* dict targets splat as kwargs (:95-98), tuple targets as args,
* ``head{i}/train/...`` / ``head{i}/valid/...`` metric namespacing,
* the ViewInvariance second-view re-encode (:92-93) via the head's
  ``target_is_second_view`` attribute,
* pretraining protocol (:159-177, 290-300) through the functional
  ``pretrain_init/pretrain_step/pretrain_end`` head hooks.
"""

import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sihl_tpu.model import SihlModel
from sihl_tpu.parallel import (
    replicated_sharding,
    shard_batch,
    shard_batch_spatial,
    shard_stacked_batch,
)
from sihl_tpu.training.optim import label_params, make_optimizer


@jax.jit
def _ema_update(ema, params, decay):
    return jax.tree_util.tree_map(lambda e, p: e * decay + p * (1 - decay), ema, params)


def _as_args(target) -> tuple:
    if target is None:
        return ()
    if isinstance(target, dict):
        return tuple(target.values())
    if isinstance(target, (tuple, list)):
        return tuple(target)
    return (target,)


def _call_step(head, method, feats, target, state=None):
    fn = getattr(head, method)
    lead = () if state is None else (state,)
    if isinstance(target, dict):
        return fn(*lead, feats, **target)
    return fn(*lead, feats, *_as_args(target))


# SIHL_TPU_REMAT_POLICY=conv: a *scoped* remat of the trunk — save only
# conv outputs (tagged in ops/conv1x1.py) and recompute the cheap BN/ReLU
# chains in the backward instead of stashing their residuals.  Unlike the
# full `remat=True` (which recomputes the convs too), this targets only
# residual-stash HBM bytes.  A/B lever for the byte-reduction question in
# the round-4 roofline (the bound moves only by removing bytes).
_REMAT_POLICY = os.environ.get("SIHL_TPU_REMAT_POLICY", "")


def _losses(model: SihlModel, x, targets):
    if getattr(model, "_remat_features", False):
        # rematerialize the trunk in the backward pass: trades FLOPs for
        # activation memory (jax.checkpoint), enabling larger batches
        feats = jax.checkpoint(
            lambda m, xx: m.extract_features(xx), static_argnums=()
        )(model, x)
    elif _REMAT_POLICY == "conv":
        from jax.ad_checkpoint import checkpoint_policies

        feats = jax.checkpoint(
            lambda m, xx: m.extract_features(xx),
            policy=checkpoint_policies.save_only_these_names("conv_out"),
        )(model, x)
    else:
        feats = model.extract_features(x)
    losses, metrics = [], {}
    for idx, (head, target) in enumerate(zip(model.heads, targets)):
        if getattr(head, "target_is_second_view", False):
            # the second view's pyramid is ONE argument, not a splat
            target = (model.extract_features(target),)
        loss, head_metrics = _call_step(head, "training_step", feats, target)
        losses.append(loss)
        metrics[f"head{idx}/train/loss"] = loss
        for k, v in head_metrics.items():
            metrics[f"head{idx}/train/{k}"] = v
    return jnp.sum(jnp.stack(losses)), metrics


@nnx.jit
def _train_step(model: SihlModel, optimizer: nnx.Optimizer, x, targets):
    def loss_fn(model):
        return _losses(model, x, targets)

    (loss, metrics), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
    optimizer.update(model, grads)
    metrics["trainer/loss"] = loss
    return metrics


def _make_scan_runner(graphdef, ema: bool):
    """Build the multi-step dispatch: ``lax.scan`` over K optimizer steps.

    The carry (model+optimizer state, and the EMA shadow if enabled) is
    **donated**, so XLA updates it in place across dispatches — no state
    copies and no per-call nnx graph traversal (the split happens once, in
    :meth:`Trainer._scan_carry`).  Returns the full per-step metrics dict
    (stacked over K), keeping feature parity with the step loop.
    """

    def body(carry, batch):
        state = carry[0] if ema else carry
        model, optimizer = nnx.merge(graphdef, state)
        x, targets = batch

        def loss_fn(model):
            return _losses(model, x, targets)

        (loss, metrics), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        metrics["trainer/loss"] = loss
        new_state = nnx.state((model, optimizer))
        if ema:
            _, ema_params, decay = carry
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e * decay + p * (1 - decay),
                ema_params,
                nnx.state(model, nnx.Param),
            )
            return (new_state, ema_params, decay), metrics
        return new_state, metrics

    # unroll>1 replicates the step body so XLA can overlap one step's
    # tail (param prefetch copies, async-dones) with the next step's
    # head at the cost of program size; A/B-tunable, default 1
    unroll = int(os.environ.get("SIHL_TPU_SCAN_UNROLL", "1") or "1")

    def run(carry, xs, targets):
        return jax.lax.scan(body, carry, (xs, targets), unroll=unroll)

    from sihl_tpu.utils.compile_opts import compiler_options

    jitted = jax.jit(run, donate_argnums=(0,), compiler_options=compiler_options())
    return _ScanDispatch(run, jitted)


class _ScanDispatch:
    """Callable wrapper around the scanned runner that, on TPU, compiles
    with an AUTO input layout for the stacked image batch and relayouts it
    ONCE at the dispatch boundary.

    Without this, each scan step's dynamic-slice of the (K,B,H,W,C) stack
    is re-laid-out for the stem conv inside the loop — measured 0.61
    ms/step on the flagship bench (ROOFLINE.md drill, bf16[1,16,640,640,3]
    T(8,128)->T(4,128)); feeding the preferred layout moves that to one
    boundary copy per dispatch (A/B: 222.6 vs 221.0 img/s).  Opt out with
    ``SIHL_TPU_XS_LAYOUT=0``.  Non-TPU backends and meshed (sharded)
    dispatches use the plain jit path unchanged.
    """

    def __init__(self, fn, jitted):
        self._fn = fn
        self._jitted = jitted
        self._cache: Dict[Any, Any] = {}

    @staticmethod
    def _enabled(xs) -> bool:
        import os

        if os.environ.get("SIHL_TPU_XS_LAYOUT", "1") != "1":
            return False
        if not isinstance(xs, jax.Array) or xs.ndim != 5:
            return False
        try:
            devs = xs.devices()
        except Exception:
            return False
        return len(devs) == 1 and next(iter(devs)).platform == "tpu"

    def __call__(self, carry, xs, targets):
        if not self._enabled(xs):
            return self._jitted(carry, xs, targets)
        try:
            leaves, treedef = jax.tree_util.tree_flatten((carry, xs, targets))
            sig = (treedef, tuple((jnp.shape(l), jnp.result_type(l)) for l in leaves))
        except Exception:  # pragma: no cover - exotic target leaves
            return self._jitted(carry, xs, targets)
        entry = self._cache.get(sig)
        if entry is None:
            from jax.experimental.layout import Format, Layout

            from sihl_tpu.utils.compile_opts import compiler_options

            try:
                compiled = (
                    jax.jit(
                        self._fn,
                        donate_argnums=(0,),
                        in_shardings=(None, Format(Layout.AUTO), None),
                        compiler_options=compiler_options(),
                    )
                    .lower(carry, xs, targets)
                    .compile()
                )
                entry = (compiled, compiled.input_formats[0][1])
            except Exception:  # pragma: no cover - plugin-dependent
                entry = (None, None)
            self._cache[sig] = entry
        if entry[0] is None:
            return self._jitted(carry, xs, targets)
        compiled, xs_format = entry
        xs_put = jax.device_put(xs, xs_format)
        try:
            put_layout = xs_put.format.layout
        except Exception:  # pragma: no cover - plugin-dependent
            put_layout = None
        if put_layout != xs_format.layout:
            # the PJRT plugin silently ignored the relayout request for this
            # shape (observed on axon with f32 (10,8,256,256,3): requested
            # (0,2,3,4,1)/(4,128), got (0,1,4,2,3)/(8,128)) — executing the
            # AUTO-layout binary would raise a layout-mismatch ValueError.
            # Permanently fall back to the plain jit path for this signature.
            self._cache[sig] = (None, None)
            return self._jitted(carry, xs, targets)
        try:
            return compiled(carry, xs_put, targets)
        except ValueError:  # pragma: no cover - belt and braces
            self._cache[sig] = (None, None)
            return self._jitted(carry, xs, targets)


@nnx.jit
def _eval_step(model: SihlModel, metric_states, x, targets):
    feats = model.extract_features(x)
    new_states, losses, auxes = [], [], []
    for head, state, target in zip(model.heads, metric_states, targets):
        if getattr(head, "target_is_second_view", False):
            target = (model.extract_features(target),)
        state, loss, aux = _call_step(head, "validation_step", feats, target, state=state)
        new_states.append(state)
        losses.append(loss)
        auxes.append(aux)
    return new_states, jnp.sum(jnp.stack(losses)), auxes


@nnx.jit
def _pretrain_step(model: SihlModel, pre_states, x, targets):
    feats = model.extract_features(x)
    new_states = []
    for head, state, target in zip(model.heads, pre_states, targets):
        if state is None or not hasattr(head, "pretrain_step"):
            new_states.append(state)
            continue
        new_states.append(_call_step(head, "pretrain_step", feats, target, state=state))
    return new_states


@nnx.jit
def _predict(model: SihlModel, x):
    return model(x)


class Trainer:
    def __init__(
        self,
        model: SihlModel,
        optimizer: str = "adam",
        optimizer_kwargs: Optional[Dict[str, Any]] = None,
        scheduler: Optional[str] = None,
        scheduler_kwargs: Optional[Dict[str, Any]] = None,
        data_config: Optional[List[Dict[str, Any]]] = None,
        hyperparameters: Optional[Dict[str, Any]] = None,
        grad_clip: Optional[float] = None,
        mesh=None,
        spatial_partition: bool = False,
        remat: bool = False,
        ema_decay: Optional[float] = None,
        logger: Optional[Callable[[Dict[str, float], int], None]] = None,
        viz_logger=None,
        viz_every: int = 0,
        visualize_n_batches: int = 5,
        visualize_n_per_batch: int = 1,
    ):
        self.model = model
        self.data_config = data_config or [{} for _ in model.heads]
        if isinstance(self.data_config, dict):
            self.data_config = [self.data_config]
        self.hyperparameters = hyperparameters
        self.logger = logger
        self.viz_logger = viz_logger
        self.viz_every = viz_every
        self.visualize_n_batches = visualize_n_batches
        self.visualize_n_per_batch = visualize_n_per_batch
        self.mesh = mesh
        self.spatial_partition = spatial_partition
        model._remat_features = remat
        self.ema_decay = ema_decay
        self.ema_params = None  # created after the (optional) mesh replication

        backbone = model.backbone

        def is_backbone(path):
            return len(path) > 0 and str(path[0]) == "backbone"

        def is_frozen(path):
            if not is_backbone(path):
                return False
            # path: ('backbone', 'features', <stage>, ...)
            if len(path) > 2 and str(path[1]) == "features":
                return backbone.is_frozen_param(path[2:])
            return False

        params = nnx.state(model, nnx.Param)
        labels = label_params(params, is_backbone, is_frozen)
        self.tx, self.schedule = make_optimizer(
            labels,
            optimizer=optimizer,
            optimizer_kwargs=optimizer_kwargs,
            scheduler=scheduler,
            scheduler_kwargs=scheduler_kwargs,
            grad_clip=grad_clip,
        )
        self.optimizer = nnx.Optimizer(model, self.tx, wrt=nnx.Param)
        self.step = 0
        self._scan_state = None
        self._scan_runner = None
        self._scan_key = None

        if mesh is not None:
            # replicate all model/optimizer state over the mesh
            sharding = replicated_sharding(mesh)
            for obj in (self.model, self.optimizer):
                state = nnx.state(obj)
                state = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sharding), state
                )
                nnx.update(obj, state)
        if ema_decay:
            # copy AFTER mesh replication so the shadow rides the same
            # replicated sharding as the params it tracks
            self.ema_params = jax.tree_util.tree_map(
                jnp.copy, nnx.state(model, nnx.Param)
            )

    # -- train -------------------------------------------------------------
    def training_step(self, x, targets=None) -> Dict[str, Any]:
        """One optimization step on a batch; returns logged metrics."""
        self._sync_model()
        if not isinstance(targets, list):
            targets = [targets]
        if self.mesh is not None:
            sharder = shard_batch_spatial if self.spatial_partition else shard_batch
            x = sharder(x, self.mesh)
            targets = sharder(targets, self.mesh)
        if (
            self.viz_logger is not None
            and self.viz_every
            and self.step % self.viz_every == 0
        ):
            self._visualize(x, targets, prefix="train/")
        self.model.train()
        self._apply_frozen_bn()
        metrics = _train_step(self.model, self.optimizer, x, targets)
        if self.ema_params is not None:
            self.ema_params = _ema_update(
                self.ema_params, nnx.state(self.model, nnx.Param), self.ema_decay
            )
        metrics["trainer/learning_rate"] = self.schedule(self.step)
        self.step += 1
        if self.logger is not None:
            self.logger({k: float(v) for k, v in metrics.items()}, self.step)
        return metrics

    def _visualize(self, x, targets, prefix, start_idx=0):
        """Render per-head panels (reference cadence: first train batch per
        epoch + cached val batches, lightning_module.py:77-86,276-286)."""
        from sihl_tpu.visualization import visualize

        n = self.visualize_n_per_batch
        x_small = x[:n]
        targets_small = jax.tree_util.tree_map(
            lambda v: v[:n] if hasattr(v, "ndim") and v.ndim >= 1 else v, targets
        )
        visualize(
            self.model, self.data_config, x_small, targets_small,
            self.viz_logger, self.step, start_idx=start_idx, prefix=prefix,
        )
        self.model.train()

    def _apply_frozen_bn(self):
        backbone = self.model.backbone
        if getattr(backbone, "freeze_batchnorms", False) and getattr(
            backbone, "frozen_levels", 0
        ):
            backbone._set_frozen_bn_eval()

    def _scan_carry(self):
        """Split (model, optimizer) once and cache the device-side carry.

        The split state is copied so the donated carry never aliases the
        live module buffers; :meth:`_sync_model` writes the carry back.
        """
        if self._scan_state is None:
            self.model.train()
            self._apply_frozen_bn()
            graphdef, state = nnx.split((self.model, self.optimizer))
            state = jax.tree_util.tree_map(jnp.copy, state)
            key = (self.ema_params is not None,)
            if self._scan_runner is None or self._scan_key != key:
                self._scan_runner = _make_scan_runner(graphdef, ema=key[0])
                self._scan_key = key
            self._scan_state = state
        if self.ema_params is not None:
            return (self._scan_state, self.ema_params, jnp.float32(self.ema_decay))
        return self._scan_state

    def _sync_model(self) -> None:
        """Write the cached scan carry back into the live modules."""
        if self._scan_state is not None:
            nnx.update((self.model, self.optimizer), self._scan_state)
            self._scan_state = None

    def sync_model(self) -> None:
        """Flush scanned-dispatch state back into ``self.model``.

        After :meth:`training_steps_scanned`, the up-to-date parameters live
        in the donated scan carry, NOT in ``self.model`` — any direct use of
        the model (feature extraction for a retrieval index set, export,
        weight inspection) must call this first.  :meth:`validate`,
        :meth:`training_step`, and checkpointing do it automatically.
        """
        self._sync_model()

    def training_steps_scanned(self, xs, targets_stacked) -> Any:
        """Run K optimizer steps in ONE device dispatch via ``lax.scan``.

        ``xs``: (K, B, H, W, C) stacked batches; ``targets_stacked``: the
        per-head targets pytree with a leading K axis.  Amortizes host
        dispatch latency — the standard TPU pattern for keeping the device
        busy.  Returns the per-step metrics dict (each value stacked to
        (K,)), same keys as :meth:`training_step`.
        """
        if not isinstance(targets_stacked, list):
            targets_stacked = [targets_stacked]
        if self.mesh is not None:
            # shard the per-step batch axis (axis 1 of the (K, B, ...) stack)
            # over the mesh's data axis — the production dispatch is as
            # mesh-correct as the single-step path (VERDICT r2 weak #2)
            xs = shard_stacked_batch(xs, self.mesh, spatial=self.spatial_partition)
            targets_stacked = shard_stacked_batch(targets_stacked, self.mesh)
        carry = self._scan_carry()
        carry, metrics = self._scan_runner(carry, xs, targets_stacked)
        if self.ema_params is not None:
            self._scan_state, self.ema_params, _ = carry
        else:
            self._scan_state = carry
        self.step += int(xs.shape[0])
        return metrics

    def fit(
        self,
        train_data,
        num_steps: int,
        val_data=None,
        val_every: Optional[int] = None,
        log_every: int = 50,
        steps_per_dispatch: int = 1,
        checkpoint_every: Optional[int] = None,
        checkpoint_dir: Optional[str] = None,
    ) -> Dict[str, float]:
        """Step-driven fit loop over an (x, targets) iterator.

        ``steps_per_dispatch > 1`` stacks that many batches and runs them
        in one scanned device dispatch (see ``training_steps_scanned``) —
        the production TPU configuration.  ``checkpoint_every`` saves the
        full train state to ``checkpoint_dir/step_N`` on that cadence
        (both dispatch modes), plus a final save when fitting ends.
        """
        import jax.numpy as _jnp

        it = iter(train_data)
        last_metrics = {}
        t0 = time.perf_counter()
        done = 0
        while done < num_steps:
            if steps_per_dispatch > 1:
                k = min(steps_per_dispatch, num_steps - done)
                batches = [next(it) for _ in range(k)]
                xs = _jnp.stack([_jnp.asarray(b[0]) for b in batches])
                tgts = [b[1] if isinstance(b[1], list) else [b[1]] for b in batches]
                stacked = jax.tree_util.tree_map(
                    lambda *vs: _jnp.stack([_jnp.asarray(v) for v in vs]), *tgts
                )
                if (
                    self.viz_logger is not None
                    and self.viz_every
                    and self.step % self.viz_every < k
                ):
                    self._sync_model()
                    self._visualize(batches[0][0], tgts[0], prefix="train/")
                scan_metrics = self.training_steps_scanned(xs, stacked)
                metrics = {k_: v[-1] for k_, v in scan_metrics.items()}
                metrics["trainer/learning_rate"] = self.schedule(self.step)
                if self.logger is not None:
                    self.logger({k_: float(v) for k_, v in metrics.items()}, self.step)
                done += k
            else:
                x, targets = next(it)
                metrics = self.training_step(x, targets)
                done += 1
            if self.step % log_every < steps_per_dispatch:
                last_metrics = {k_: float(v) for k_, v in metrics.items()}
                last_metrics["trainer/steps_per_sec"] = log_every / max(
                    time.perf_counter() - t0, 1e-9
                )
                t0 = time.perf_counter()
            if val_data is not None and val_every and self.step % val_every < steps_per_dispatch:
                last_metrics.update(self.validate(val_data))
            if (
                checkpoint_every
                and checkpoint_dir
                and self.step % checkpoint_every < steps_per_dispatch
            ):
                self._save_checkpoint(checkpoint_dir)
        if checkpoint_every and checkpoint_dir:
            self._save_checkpoint(checkpoint_dir)
        return last_metrics

    def _save_checkpoint(self, checkpoint_dir: str) -> None:
        import os

        from sihl_tpu.training.checkpoint import save_checkpoint

        os.makedirs(checkpoint_dir, exist_ok=True)
        save_checkpoint(self, os.path.join(checkpoint_dir, f"step_{self.step}"))

    # -- validation ---------------------------------------------------------
    def validate(self, val_data) -> Dict[str, float]:
        self._sync_model()
        self.model.eval()
        for head in self.model.heads:
            # host-side calibration hook (e.g. anomaly quantiles), mirroring
            # the reference's on_validation_start (lightning_module.py:247-251)
            if hasattr(head, "on_validation_start"):
                head.on_validation_start()
        states = [head.metrics_init() for head in self.model.heads]
        collected = [[] for _ in self.model.heads]
        viz_batches = []
        for x, targets in val_data:
            if not isinstance(targets, list):
                targets = [targets]
            if self.viz_logger is not None and len(viz_batches) < self.visualize_n_batches:
                viz_batches.append((x, targets))
            if self.mesh is not None:
                x = shard_batch(x, self.mesh)
                targets = shard_batch(targets, self.mesh)
            states, _, auxes = _eval_step(self.model, states, x, targets)
            for idx, aux in enumerate(auxes):
                if aux:
                    collected[idx].append(jax.device_get(aux))
        metrics = {}
        for idx, (head, state) in enumerate(zip(self.model.heads, states)):
            for k, v in head.validation_end(state, collected[idx]).items():
                metrics[f"head{idx}/valid/{k}"] = v
        if self.logger is not None:
            self.logger(metrics, self.step)
            if self.hyperparameters and hasattr(self.logger, "log_hyperparams"):
                self.logger.log_hyperparams(self.hyperparameters, metrics, self.step)
        for i, (x, targets) in enumerate(viz_batches):
            self._visualize(
                x, targets, prefix="valid/", start_idx=i * self.visualize_n_per_batch
            )
        return metrics

    # -- pretraining protocol (anomaly head teacher calibration) ------------
    def pretrain(self, data) -> None:
        self._sync_model()
        self.model.eval()
        states = [
            head.pretrain_init() if hasattr(head, "pretrain_init") else None
            for head in self.model.heads
        ]
        if all(s is None for s in states):
            return
        for x, targets in data:
            if not isinstance(targets, list):
                targets = [targets]
            states = _pretrain_step(self.model, states, x, targets)
        for head, state in zip(self.model.heads, states):
            if state is not None and hasattr(head, "pretrain_end"):
                head.pretrain_end(state)

    def use_ema_params(self) -> None:
        """Copy the EMA shadow into the live model (e.g. before export).

        The reference lists EMA as an open TODO (lightning_module.py:17);
        here it's a first-class option (``ema_decay``)."""
        assert self.ema_params is not None
        self._sync_model()
        nnx.update(self.model, self.ema_params)

    # -- inference -----------------------------------------------------------
    def predict(self, x):
        self._sync_model()
        self.model.eval()
        return _predict(self.model, x)

    # -- state access (for checkpointing) ------------------------------------
    @property
    def params(self):
        self._sync_model()
        return nnx.state(self.model, nnx.Param)

    def state_dict(self):
        self._sync_model()
        out = {
            "model": nnx.to_pure_dict(nnx.state(self.model)),
            "opt": nnx.to_pure_dict(nnx.state(self.optimizer)),
            "step": self.step,
        }
        if self.ema_params is not None:
            # the EMA shadow is train state too: losing it on resume would
            # restart the average from the live params
            out["ema"] = nnx.to_pure_dict(self.ema_params)
        return out

    def load_state_dict(self, state) -> None:
        self._sync_model()
        self._scan_runner = None  # loaded state may change array dtypes/shapes
        model_state = nnx.state(self.model)
        nnx.replace_by_pure_dict(model_state, state["model"])
        nnx.update(self.model, model_state)
        opt_state = nnx.state(self.optimizer)
        nnx.replace_by_pure_dict(opt_state, state["opt"])
        nnx.update(self.optimizer, opt_state)
        if self.ema_params is not None and "ema" in state:
            ema = jax.tree_util.tree_map(jnp.copy, nnx.state(self.model, nnx.Param))
            nnx.replace_by_pure_dict(ema, state["ema"])
            self.ema_params = ema
        self.step = int(state["step"])

"""The single SPMD training/eval/predict engine.

One engine covers what the reference spreads over pytorch-lightning Trainer +
per-model LightningModule wrappers + PhiSNet's two hand-rolled loops
(SURVEY §2.3, §2.6): jitted train/eval steps over a device mesh, weighted
multi-task losses, EMA, plateau/warmup schedules, top-k checkpointing, early
stopping, metric accumulation, and profiler hooks.

Parallelism model: parameters replicated, batch dp-sharded over the mesh
(`nabladft_tpu.parallel.mesh`). The jitted step is compiled once per bucket
shape; XLA inserts the gradient psums. There are no process groups, no DDP
wrappers, no `sync_dist` flags — the collective story lives entirely in the
sharding annotations.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nabladft_tpu.data.batch import MolBatch
from nabladft_tpu.models.base import forward
from nabladft_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from nabladft_tpu.train import losses as losses_lib
from nabladft_tpu.train.checkpoints import CheckpointManager
from nabladft_tpu.train.loggers import Logger, StdoutLogger
from nabladft_tpu.train.metrics import MetricAccumulator, batch_metric_sums
from nabladft_tpu.train.schedulers import PlateauState, build_schedule, lookahead
from nabladft_tpu.train.state import (
    TrainState,
    current_learning_rate,
    ema_update,
    set_learning_rate,
)

logger = logging.getLogger(__name__)


@dataclass
class TrainerConfig:
    max_epochs: int = 100
    max_steps: Optional[int] = None
    # wall-clock bound on fit() (Lightning Trainer max_time parity): stop
    # after the first optimizer step past the limit, then run the normal
    # epoch-end validate/checkpoint path so a bounded run still leaves a
    # usable artifact (queue slices on the shared chip need this — an
    # outer `timeout` kills the process with nothing written).
    max_seconds: Optional[float] = None
    optimizer: str = "adamw"  # adamw | adam | amsgrad | sgd
    lr: float = 1e-4
    weight_decay: float = 0.0
    # Skip weight decay on 1-d params (biases, layer-norm scales, RBF
    # offsets) — the reference EquiformerV2 no_weight_decay param-group
    # split (equiformer_v2_oc20.py:640-668), generalized by rank.
    wd_skip_1d: bool = True
    grad_clip: Optional[float] = None
    schedule: str = "plateau"  # plateau | constant | linear | polynomial | cosine | multistep
    schedule_kwargs: Dict[str, Any] = field(default_factory=dict)
    # decay horizon for step-indexed schedules (cosine/linear/polynomial);
    # falls back to max_steps. Needed when fit() is driven in chunks with
    # max_steps=None (examples/hamiltonian_precision.py) — the schedule is
    # a function of the GLOBAL state.step, so the horizon must be the whole
    # run, not the chunk.
    total_steps: Optional[int] = None
    warmup_steps: int = 0
    plateau_factor: float = 0.8
    plateau_patience: int = 10
    plateau_min_lr: float = 1e-6
    ema_decay: float = 0.0  # 0 disables EMA
    eval_with_ema: bool = True
    # Lookahead slow-weight sync (PhiSNet legacy trainer,
    # phisnet/training/lookahead.py:8): 0 disables
    lookahead_k: int = 0
    lookahead_alpha: float = 0.5
    log_every_n_steps: int = 50
    # parameter-histogram summaries every N steps (tensorboard backend
    # only; PhiSNet legacy tensorboardX parity). None disables.
    hist_every_n_steps: Optional[int] = None
    ckpt_dir: Optional[str] = None
    save_top_k: int = 3
    monitor: str = "val/loss"
    early_stopping_patience: Optional[int] = None
    # validate every N optimizer steps in addition to epoch ends (large
    # splits run few epochs; reference relies on max_steps instead)
    val_every_n_steps: Optional[int] = None
    # stop when the (plateau-driven) LR falls below this floor — PhiSNet's
    # stop criterion (reference phisnet/train.py stop_at_learning_rate)
    stop_at_lr: Optional[float] = None
    seed: int = 42
    n_dp: Optional[int] = None  # None = all devices
    profile_dir: Optional[str] = None
    log_mfu: bool = False  # XLA cost analysis can be slow on remote backends
    loss_specs: Dict[str, str] = field(
        default_factory=lambda: {"energy": "l1", "forces": "l2norm"}
    )
    loss_coefs: Dict[str, float] = field(
        default_factory=lambda: {"energy": 1.0, "forces": 1.0}
    )
    # PhiSNet max-error loss gating (phisnet/training/util.py:37-45):
    # target -> MAE clamp; a target whose batch MAE exceeds its clamp is
    # dropped from the training total that step (train steps only).
    loss_max_errors: Optional[Dict[str, float]] = None
    # force-loss gradient implementation for derivative-force models:
    #   "direct"    — reverse-over-reverse AD (any model, any platform);
    #   "surrogate" — forward-over-reverse: ∂/∂θ Σ w·F is the grad of a JVP
    #                 in direction w = ∂L_f/∂F (stop-grad); same gradient
    #                 (tested), lighter on memory;
    #   "pallas"    — the surrogate with the model's fused kernel modes: the
    #                 force pass runs use_pallas="fused" (custom VJP) and
    #                 the JVP lane use_pallas="train" (custom JVP → dual
    #                 kernel). Requires a model with a `use_pallas` field
    #                 (PaiNN); ~2.5x faster than "direct" on TPU.
    force_grads: str = "direct"
    # legacy alias: True ≡ force_grads="surrogate"
    fast_force_grads: bool = False
    # fit data-driven ScaleFactors (models with a "scales" variable
    # collection, e.g. GemNet-OC) from the first training batches before
    # optimization — reference gemnet_oc scale_file / fit semantics
    fit_scale_factors: bool = True
    scale_fit_batches: int = 4
    # Keep an in-memory snapshot of the best-`monitor` parameters during
    # fit and restore it before test/predict (restore_best_for_test).
    # This is the compiled-SPMD analog of the reference protocol: Lightning
    # tests against the ModelCheckpoint best, never the last step
    # (config/callbacks/default.yaml top-3 on val/loss) — without it a
    # late-training divergence poisons the test metrics (r3 DimeNet++).
    keep_best_params: bool = True
    restore_best_for_test: bool = True


class Trainer:
    """fit / validate / test / predict over a model + datamodule."""

    def __init__(
        self,
        model,
        config: TrainerConfig = TrainerConfig(),
        loggers: Optional[Logger] = None,
        eval_model=None,
    ):
        self.model = model
        self.eval_model = eval_model or model
        self.cfg = config
        self._force_grads = config.force_grads
        if config.fast_force_grads and self._force_grads == "direct":
            self._force_grads = "surrogate"
        if self._force_grads == "pallas":
            if not hasattr(model, "use_pallas"):
                raise ValueError("force_grads='pallas' needs a model with use_pallas")
            self._model_fused = model.clone(use_pallas="fused")
            self._model_dual = model.clone(use_pallas="train")
        else:
            self._model_fused = self._model_dual = model
        self.loggers = loggers or StdoutLogger()
        self.mesh = make_mesh(n_dp=config.n_dp)
        self.n_dp = self.mesh.shape["dp"]
        self.plateau = PlateauState(
            factor=config.plateau_factor,
            patience=config.plateau_patience,
            min_lr=config.plateau_min_lr,
        )
        self.tx = self._build_tx()
        self.state: Optional[TrainState] = None
        self._step_flops: Optional[float] = None
        # (step, params, ema_params) device copies at the best `monitor`
        self._best_snapshot = None
        self.ckpt = (
            CheckpointManager(
                Path(config.ckpt_dir), top_k=config.save_top_k, monitor=config.monitor
            )
            if config.ckpt_dir
            else None
        )
        self._jit_train_step = jax.jit(
            self._train_step,
            donate_argnums=(0,),
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh)),
        )
        self._jit_eval_step = jax.jit(
            self._eval_step,
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh)),
        )
        self._jit_predict_step = jax.jit(
            self._predict_step,
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh)),
        )

    # -- setup ---------------------------------------------------------------

    def _build_tx(self) -> optax.GradientTransformation:
        cfg = self.cfg
        schedule = build_schedule(
            cfg.schedule,
            cfg.lr,
            total_steps=cfg.total_steps or cfg.max_steps or 1_000_000,
            warmup_steps=cfg.warmup_steps,
            **cfg.schedule_kwargs,
        )
        lr: Any = schedule if schedule is not None else cfg.lr
        # wd_skip_1d: decay only rank>=2 params (weights), never biases /
        # layer-norm scales / RBF offsets — the reference EquiformerV2
        # no_weight_decay param-group split generalized by rank.
        wd_mask = (
            (lambda params: jax.tree_util.tree_map(lambda p: p.ndim > 1, params))
            if cfg.wd_skip_1d
            else None
        )
        opts = {
            "adamw": lambda r: optax.adamw(
                r, weight_decay=cfg.weight_decay, mask=wd_mask
            ),
            "adam": lambda r: optax.adam(r),
            # PhiSNet / GemNet-OC / eSCN train with amsgrad (their configs)
            "amsgrad": lambda r: optax.amsgrad(r),
            "sgd": lambda r: optax.sgd(r, momentum=0.9),
        }
        core = optax.inject_hyperparams(
            lambda learning_rate: opts[cfg.optimizer](learning_rate)
        )(learning_rate=lr)
        parts = []
        if cfg.grad_clip:
            parts.append(optax.clip_by_global_norm(cfg.grad_clip))
        parts.append(core)
        if cfg.warmup_steps and schedule is None:
            # constant/plateau schedules carry no device-side warmup (the
            # plateau multiplier is a host-side rewrite of the injected
            # scalar lr), so compose warmup as a separate update scaling:
            # ramps 0→1 over warmup_steps, identity afterwards. Needed by
            # architectures whose init gradients are huge relative to the
            # loss (DimeNet++'s late interaction blocks amplify messages
            # ~7x/block at init, matching torch_geometric).
            w = float(cfg.warmup_steps)
            parts.append(
                optax.scale_by_schedule(lambda step: jnp.minimum(1.0, (step + 1) / w))
            )
        if cfg.lookahead_k:
            parts.append(lookahead(cfg.lookahead_k, cfg.lookahead_alpha))
        return parts[0] if len(parts) == 1 else optax.chain(*parts)

    def _maybe_shrink_mesh(self, batch_size: int) -> None:
        """If the batch doesn't divide the dp axis, rebuild the mesh with the
        largest dividing device count (and re-jit the steps)."""
        if batch_size % self.n_dp == 0:
            return
        n = self.n_dp
        while batch_size % n:
            n -= 1
        logger.warning(
            "batch size %d not divisible by %d devices; using dp=%d",
            batch_size, self.n_dp, n,
        )
        self.mesh = make_mesh(n_dp=n)
        self.n_dp = n
        self._jit_train_step = jax.jit(
            self._train_step,
            donate_argnums=(0,),
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh)),
        )
        self._jit_eval_step = jax.jit(
            self._eval_step,
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh)),
        )
        self._jit_predict_step = jax.jit(
            self._predict_step,
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh)),
        )

    def init_state(self, example_batch: MolBatch) -> TrainState:
        self._maybe_shrink_mesh(example_batch.z.shape[0])
        batch = jax.tree_util.tree_map(jnp.asarray, example_batch)
        # jit the init: eager flax init dispatches each op separately, which
        # is pathologically slow on remote/tunneled TPU backends
        k1, k2 = jax.random.split(jax.random.PRNGKey(self.cfg.seed))
        params = jax.jit(self.model.init)({"params": k1, "dropout": k2}, batch)
        self.state = TrainState.create(params, self.tx, ema=self.cfg.ema_decay > 0)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        logger.info(
            "initialized %s: %.2fM params, mesh dp=%d",
            type(self.model).__name__, n_params / 1e6, self.n_dp,
        )
        return self.state

    # -- jitted steps --------------------------------------------------------

    def _loss_and_out(self, params, batch, model, rngs=None, max_errors=None):
        out = forward(model, params, batch, rngs=rngs)
        losses = losses_lib.multitask_loss(
            out, batch, self.cfg.loss_specs, self.cfg.loss_coefs,
            max_errors=max_errors,
        )
        return losses, out

    def _surrogate_grads(self, params, batch: MolBatch, rngs):
        """Gradients for energy+derivative-forces losses via one reverse
        pass for F and one reverse-over-JVP pass for the mixed term.

        In force_grads="pallas" mode the reverse pass runs the fused-kernel
        model and the JVP lane runs the dual-kernel model (same params)."""
        cfg = self.cfg
        nmask3 = batch.node_mask[..., None]
        kwargs = {"rngs": rngs} if rngs else {}

        def e_fn_rev(params, pos):
            out = self._model_fused.apply(params, batch.replace(pos=pos), **kwargs)
            e = jnp.where(batch.graph_mask, out["energy"], 0.0)
            return e.sum(), out

        def e_fn(params, pos):
            out = self._model_dual.apply(params, batch.replace(pos=pos), **kwargs)
            e = jnp.where(batch.graph_mask, out["energy"], 0.0)
            return e.sum(), out

        (_, out), gpos = jax.value_and_grad(e_fn_rev, argnums=1, has_aux=True)(
            params, batch.pos
        )
        forces = -gpos * nmask3
        out_full = dict(out)
        out_full["forces"] = forces
        losses = losses_lib.multitask_loss(
            out_full, batch, cfg.loss_specs, cfg.loss_coefs,
            max_errors=cfg.loss_max_errors,
        )

        f_kind = cfg.loss_specs["forces"]

        def force_term(f):
            val = losses_lib.LOSS_FNS[f"forces_{f_kind}"](f, batch.forces, batch.node_mask)
            return cfg.loss_coefs.get("forces", 1.0) * val

        w = jax.lax.stop_gradient(jax.grad(force_term)(forces) * nmask3)
        non_force = {k: v for k, v in cfg.loss_specs.items() if k != "forces"}

        def surrogate(params):
            primal, tangent = jax.jvp(
                lambda pos: e_fn(params, pos), (batch.pos,), (w,)
            )
            _, out_p = primal
            t_esum, _ = tangent
            other = losses_lib.multitask_loss(out_p, batch, non_force, cfg.loss_coefs)
            # F = -∇E  ⇒  Σ w·F = -(jvp of Σ E in direction w)
            return other["total"] - t_esum

        grads = jax.grad(surrogate)(params)
        return grads, losses, out_full

    def _train_step(self, state: TrainState, batch: MolBatch):
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed), state.step)}

        def loss_fn(params):
            losses, out = self._loss_and_out(
                params, batch, self.model, rngs=rngs,
                max_errors=self.cfg.loss_max_errors,
            )
            return losses["total"], (losses, out)

        use_surrogate = (
            self._force_grads in ("surrogate", "pallas")
            and getattr(self.model, "derivative_forces", False)
            and "forces" in self.cfg.loss_specs
        )
        if use_surrogate:
            grads, losses, out = self._surrogate_grads(state.params, batch, rngs)
        else:
            grads, (losses, out) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # non-"params" collections (fitted scale factors, ...) are frozen:
        # restore them verbatim after the optimizer step
        if isinstance(params, dict):
            for coll in params:
                if coll != "params":
                    params[coll] = state.params[coll]
        # NaN guard: skip the update entirely when the gradient is non-finite
        # (the compiled analog of the reference's failure handling — PhiSNet's
        # skip-batch loop, train.py:347-358, and GemNet's ForceScaler retry)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm) & jnp.isfinite(losses["total"])
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old), params, state.params
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old)
            if hasattr(new, "dtype")
            else new,
            opt_state,
            state.opt_state,
        )
        ema = state.ema_params
        if ema is not None:
            ema = ema_update(ema, params, self.cfg.ema_decay)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
        metrics = {f"train/{k}": v for k, v in losses.items()}
        metrics["grad_norm"] = gnorm
        metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        return new_state, metrics

    def _ckpt_aux(self):
        aux = {}
        # record the resolved parameter layout (eSCN/EqV2 use_pallas="auto"
        # resolves per backend; a layout-mismatched restore must fail with
        # an actionable message, not a flax structure error)
        from nabladft_tpu.models.param_convert import params_layout

        layout = params_layout(self.model)
        if layout != "shared":
            aux["params_layout"] = layout
        if self.cfg.schedule == "plateau":
            aux["plateau"] = {
                "best": self.plateau.best,
                "bad_epochs": self.plateau.bad_epochs,
                "multiplier": self.plateau.multiplier,
            }
        return aux or None

    def _check_ckpt_layout(self, aux, ckpt_path) -> None:
        from nabladft_tpu.models.param_convert import params_layout

        saved = (aux or {}).get("params_layout")
        current = params_layout(self.model)
        if saved and current != "shared" and saved != current:
            raise ValueError(
                f"checkpoint {ckpt_path} was saved in the {saved!r} parameter "
                f"layout but this model resolves to {current!r} "
                f"(use_pallas={getattr(self.model, 'use_pallas', None)!r} on "
                f"backend {jax.default_backend()!r}). For evaluation, load the "
                "raw params with train.checkpoints.load_params_for(model, path) "
                "which remaps layouts losslessly; to resume training, "
                "instantiate the model with use_pallas pinned to the saved "
                "layout."
            )

    def _restore_aux(self, aux) -> None:
        if aux and "plateau" in aux:
            p = aux["plateau"]
            self.plateau.best = p["best"]
            self.plateau.bad_epochs = p["bad_epochs"]
            self.plateau.multiplier = p["multiplier"]

    def _eval_params(self, state: TrainState):
        if self.cfg.ema_decay > 0 and self.cfg.eval_with_ema and state.ema_params is not None:
            return state.ema_params
        return state.params

    def _eval_step(self, state: TrainState, batch: MolBatch):
        losses, out = self._loss_and_out(self._eval_params(state), batch, self.eval_model)
        sums = batch_metric_sums(out, batch)
        sums["loss_sum"] = losses["total"]
        sums["loss_count"] = jnp.ones(())
        return sums

    def _predict_step(self, state: TrainState, batch: MolBatch):
        out = forward(self.eval_model, self._eval_params(state), batch)
        return out

    # -- loops ---------------------------------------------------------------

    def fit(self, datamodule, ckpt_path: Optional[str] = None) -> Dict[str, float]:
        cfg = self.cfg
        train_loader = datamodule.train_dataloader()
        step = 0
        if self.state is None:
            first = next(iter(train_loader))
            self.init_state(first)
        if ckpt_path:
            assert self.ckpt is not None
            aux = self.ckpt.read_aux(Path(ckpt_path))
            self._check_ckpt_layout(aux, ckpt_path)
            self.state, step = self.ckpt.restore(self.state, Path(ckpt_path))
            # reference parity: Lightning persists lr-scheduler state in
            # checkpoints; restore the plateau counters alongside
            self._restore_aux(aux)
        if (
            cfg.fit_scale_factors
            and not ckpt_path
            and isinstance(self.state.params, dict)
            and "scales" in self.state.params
        ):
            from nabladft_tpu.models.gemnet_oc import fit_scale_factors

            fit_batches = []
            for i, bb in enumerate(train_loader):
                fit_batches.append(bb)
                if i + 1 >= cfg.scale_fit_batches:
                    break
            logger.info("fitting scale factors from %d batches", len(fit_batches))
            new_vars = fit_scale_factors(self.model, self.state.params, fit_batches)
            self.state = self.state.replace(params=new_vars)

        if cfg.profile_dir:
            jax.profiler.start_trace(cfg.profile_dir)

        stop = False
        best = float("inf")
        bad_epochs = 0
        final_metrics: Dict[str, float] = {}
        t_last = time.perf_counter()
        t_fit0 = t_last
        try:
            for epoch in range(cfg.max_epochs):
                for batch in train_loader:
                    if self._step_flops is None:
                        self._step_flops = 0.0
                        if cfg.log_mfu:
                            from nabladft_tpu.train import profiling

                            self._step_flops = profiling.compiled_flops(
                                self._jit_train_step, self.state, batch
                            ) or 0.0
                    self.state, metrics = self._jit_train_step(self.state, batch)
                    step = int(self.state.step)
                    if step % cfg.log_every_n_steps == 0:
                        from nabladft_tpu.train import profiling

                        now = time.perf_counter()
                        host = {k: float(v) for k, v in metrics.items()}
                        host["epoch"] = epoch
                        sps = cfg.log_every_n_steps / max(now - t_last, 1e-9)
                        host["steps_per_sec"] = sps
                        host["mols_per_sec"] = sps * batch.num_mols
                        if self._step_flops:
                            u = profiling.mfu(self._step_flops, 1.0 / sps, self.n_dp)
                            if u is not None:
                                host["mfu"] = u
                        lr = current_learning_rate(self.state.opt_state)
                        if lr is not None:
                            host["lr"] = lr
                        self.loggers.log_metrics(host, step)
                        t_last = now
                    if (
                        cfg.hist_every_n_steps
                        and step % cfg.hist_every_n_steps == 0
                    ):
                        self.loggers.log_histograms(self.state.params, step)
                    if (
                        cfg.val_every_n_steps
                        and step % cfg.val_every_n_steps == 0
                    ):
                        mid = self.validate(datamodule.val_dataloader())
                        mid["epoch"] = epoch
                        self.loggers.log_metrics(mid, step)
                        final_metrics = mid
                        monitored = mid.get(cfg.monitor)
                        if monitored is not None and cfg.schedule == "plateau":
                            new_lr = self.plateau.step(monitored, cfg.lr)
                            self.state = self.state.replace(
                                opt_state=set_learning_rate(self.state.opt_state, new_lr)
                            )
                        if self.ckpt:
                            self.ckpt.save(self.state, step, mid, aux=self._ckpt_aux())
                    if cfg.max_steps and step >= cfg.max_steps:
                        stop = True
                        break
                    if (
                        cfg.max_seconds
                        and time.perf_counter() - t_fit0 > cfg.max_seconds
                    ):
                        logger.info("stopping: max_seconds %.0f reached",
                                    cfg.max_seconds)
                        stop = True
                        break
                    lr_now = current_learning_rate(self.state.opt_state)
                    if cfg.stop_at_lr and lr_now is not None and lr_now < cfg.stop_at_lr:
                        logger.info("stopping: lr %.2e below floor", lr_now)
                        stop = True
                        break

                val_metrics = self.validate(datamodule.val_dataloader())
                val_metrics["epoch"] = epoch
                self.loggers.log_metrics(val_metrics, step)
                final_metrics = val_metrics

                monitored = val_metrics.get(cfg.monitor)
                if monitored is not None:
                    if cfg.schedule == "plateau":
                        new_lr = self.plateau.step(monitored, cfg.lr)
                        self.state = self.state.replace(
                            opt_state=set_learning_rate(self.state.opt_state, new_lr)
                        )
                    if self.ckpt:
                        self.ckpt.save(self.state, step, val_metrics, aux=self._ckpt_aux())
                    if monitored < best - 1e-12:
                        best, bad_epochs = monitored, 0
                        if cfg.keep_best_params:
                            # jnp.copy: fresh buffers — the originals are
                            # donated to the next train step
                            copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
                            self._best_snapshot = (
                                step,
                                copy(self.state.params),
                                copy(self.state.ema_params)
                                if self.state.ema_params is not None else None,
                            )
                    else:
                        bad_epochs += 1
                        if (
                            cfg.early_stopping_patience
                            and bad_epochs > cfg.early_stopping_patience
                        ):
                            logger.info("early stopping at epoch %d", epoch)
                            stop = True
                elif self.ckpt:
                    self.ckpt.save(self.state, step, val_metrics, aux=self._ckpt_aux())
                if stop:
                    break
        finally:
            if cfg.profile_dir:
                jax.profiler.stop_trace()
        logger.info("fit finished at step %d", step)
        return final_metrics

    def validate(self, loader, prefix: str = "val") -> Dict[str, float]:
        acc = MetricAccumulator()
        loss_sum, n_batches = 0.0, 0
        for batch in loader:
            if self.state is None:
                self.init_state(batch)
            sums = self._jit_eval_step(self.state, batch)
            loss_sum += float(sums.pop("loss_sum"))
            n_batches += int(sums.pop("loss_count"))
            acc.update(sums)
        metrics = {f"{prefix}/{k}": v for k, v in acc.compute().items()}
        if n_batches:
            metrics[f"{prefix}/loss"] = loss_sum / n_batches
        return metrics

    def restore_best(self) -> bool:
        """Swap in the best-`monitor` parameter snapshot taken during fit.
        Returns False when no snapshot exists (fit never improved, or
        keep_best_params off)."""
        if self._best_snapshot is None:
            return False
        step, params, ema = self._best_snapshot
        logger.info("restoring best %s params from step %d", self.cfg.monitor, step)
        self.state = self.state.replace(params=params, ema_params=ema)
        return True

    def test(self, loader) -> Dict[str, float]:
        # reference protocol: Lightning tests the ModelCheckpoint best on
        # val/loss, never the final step (config/callbacks/default.yaml)
        if self.cfg.restore_best_for_test:
            self.restore_best()
        return self.validate(loader, prefix="test")

    def predict(self, loader) -> Iterator[Dict[str, np.ndarray]]:
        """Yields per-batch host outputs with padding molecules removed."""
        for batch in loader:
            if self.state is None:
                self.init_state(batch)
            out = self._jit_predict_step(self.state, batch)
            keep = np.asarray(batch.graph_mask)
            host = {k: np.asarray(v)[keep] for k, v in out.items()}
            host["mol_id"] = np.asarray(batch.mol_id)[keep]
            host["n_atoms"] = np.asarray(batch.node_mask.sum(-1))[keep]
            yield host

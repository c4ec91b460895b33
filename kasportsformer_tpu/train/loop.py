"""Training loop: jitted train step, LR schedule, epoch driver.

Rebuilds the reference recipe (`train_and_evaluate_sp.py:201-402`) as one
compiled XLA program per step plus a thin host loop:

* the train step fuses batch gather + flip augmentation + forward + loss +
  backward + AdamW update in a single jit (the reference crosses the host
  boundary per batch for data movement and loss logging);
* AdamW(5e-4, wd 0.01) via optax with an injected learning-rate hyperparam so
  the host-side schedule (10-epoch linear warmup from lr/100 +
  ReduceLROnPlateau(factor 0.9, patience 2) stepping only after warmup —
  `:325-329`, `:393-397`) mutates a scalar, not the compiled program;
* partial final batches use wraparound padding + weight masks, so every step
  has one static shape; weighted means make the padded samples inert;
* early stop after `training_epoch_patience` non-improving epochs (`:399-402`);
* per-epoch checkpoointing: orbax native (best + latest) with a correct
  resume schema (the reference's resume has mismatched save/load keys,
  SURVEY.md §5.4 — fixed here by construction).
"""

from __future__ import annotations

import functools
import math
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kasportsformer_tpu.config import Config
from kasportsformer_tpu.data.clips import ClipSet
from kasportsformer_tpu.data.pipeline import (
    device_put_clipset,
    epoch_plan,
    random_flip_batch,
    take_batch,
    truncate_channels,
)
from kasportsformer_tpu.train import checkpoint as ckpt
from kasportsformer_tpu.train.evaluator import Evaluator
from kasportsformer_tpu.train.losses import (
    cos_similarity_loss,
    cos_similarity_velocity_loss,
    limb_length_loss,
    limb_length_variance_loss,
    mpjpe_loss,
    n_mpjpe_loss,
    velocity_loss,
)
from kasportsformer_tpu.utils.common import get_logger


# ------------------------------------------------------------ weighted loss


def _per_sample(fn: Callable, predict: jnp.ndarray, target: jnp.ndarray
                ) -> jnp.ndarray:
    """Apply a (1-sample-batch) loss per sample -> (B,) via vmap."""
    return jax.vmap(lambda p, t: fn(p[None], t[None]))(predict, target)


def weighted_total_loss(predict: jnp.ndarray, target: jnp.ndarray,
                        weights: jnp.ndarray, lambda_n_mpjpe: float,
                        lambda_mpjpe_velocity: float,
                        lambda_limb_len_var: float = 0.0,
                        lambda_limb_len: float = 0.0,
                        lambda_limb_cos_simi: float = 0.0,
                        lambda_limb_cos_simi_velocity: float = 0.0,
                        ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Reference objective (`train_and_evaluate_sp.py:212-222`) plus the limb
    family the reference ships commented out (`:216-220`,
    `utils/loss_calc.py:30-94`), with a per-sample 0/1 weight so padded
    samples contribute nothing. With all weights 1 this equals
    `losses.total_loss` exactly (all clips share T, J). Lambdas are static
    config values, so zero-lambda terms compile away.
    """
    w = weights / jnp.maximum(jnp.sum(weights), 1.0)

    def wmean(fn):
        return jnp.sum(_per_sample(fn, predict, target) * w)

    l_mpjpe = wmean(mpjpe_loss)
    l_n = wmean(n_mpjpe_loss)
    l_vel = wmean(velocity_loss)
    total = l_mpjpe + lambda_n_mpjpe * l_n + lambda_mpjpe_velocity * l_vel
    comps = {
        "loss_mpjpe": l_mpjpe,
        "loss_n_mpjpe": l_n,
        "loss_velocity": l_vel,
    }
    if lambda_limb_len_var:
        comps["loss_limb_len_var"] = wmean(
            lambda p, t: limb_length_variance_loss(p))
        total = total + lambda_limb_len_var * comps["loss_limb_len_var"]
    if lambda_limb_len:
        comps["loss_limb_len"] = wmean(limb_length_loss)
        total = total + lambda_limb_len * comps["loss_limb_len"]
    if lambda_limb_cos_simi:
        comps["loss_limb_len_cos_simi"] = wmean(cos_similarity_loss)
        total = total + lambda_limb_cos_simi * comps["loss_limb_len_cos_simi"]
    if lambda_limb_cos_simi_velocity:
        comps["loss_limb_len_cos_simi_velocity"] = wmean(
            cos_similarity_velocity_loss)
        total = (total + lambda_limb_cos_simi_velocity
                 * comps["loss_limb_len_cos_simi_velocity"])
    comps["loss_total"] = total
    return total, comps


# ------------------------------------------------------------ optimizer


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """AdamW matching torch defaults (betas 0.9/0.999, eps 1e-8), decay on
    all params (the reference passes the full parameter list,
    `train_and_evaluate_sp.py:270-272`). The learning rate is injected so the
    host schedule can set it between steps."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=config.learning_rate,
        b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=config.weight_decay,
    )


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (mode='min',
    threshold 1e-4 rel, cooldown 0) as used at
    `train_and_evaluate_sp.py:273`."""

    def __init__(self, factor: float = 0.9, patience: int = 2,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = math.inf
        self.num_bad_epochs = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best * (1 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            lr = lr * self.factor
            self.num_bad_epochs = 0
        return lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, sd: dict) -> None:
        self.best = sd["best"]
        self.num_bad_epochs = sd["num_bad_epochs"]


def decay_learning_rate_exponentially(lr: float, decay: float) -> float:
    """Exponential LR decay helper (≙ `utils/utilities.py:121-125`; the
    reference ships it unused — the main loop uses ReduceLROnPlateau)."""
    return lr * decay


def warmup_lr(config: Config, epoch: int) -> float | None:
    """Linear warmup from lr/100 over `warmup_epoches` epochs; the reference
    applies it while epoch <= warmup_epoches (`:325-329`)."""
    if config.warmup and epoch <= config.warmup_epoches:
        start = config.learning_rate / 100
        return start + (config.learning_rate - start) * (epoch / config.warmup_epoches)
    return None


# ------------------------------------------------------------ train step


def make_grads_fn(model, config: Config):
    """Gradient/loss computation shared by the train step (separated so the
    microbatch accumulation is unit-testable against the full-batch form):
    returns `compute(params, state, x, y, weights, key) -> (grads, comps,
    new_state)`."""

    # Zoo models with stochastic depth take a `key` kwarg in apply (e.g.
    # MixSTE/DSTFormer, ≙ reference dpr defaults `model/MixSTE.py:414`);
    # thread the step key through so drop-path actually runs in training.
    # Models whose train forward needs the target too (D3DP's q-sample
    # diffusion objective) define `train_predict(params, state, x, y, key)`.
    import inspect

    takes_key = "key" in inspect.signature(model.apply).parameters
    has_train_predict = hasattr(model, "train_predict")

    def loss_fn(params, state, x, y, weights, key):
        if has_train_predict:
            pred, new_state = model.train_predict(params, state, x, y, key)
        elif takes_key:
            pred, new_state = model.apply(params, state, x, train=True, key=key)
        else:
            pred, new_state = model.apply(params, state, x, train=True)
        total, comps = weighted_total_loss(
            pred, y, weights, config.lambda_n_mpjpe,
            config.lambda_mpjpe_velocity, config.lambda_limb_len_var,
            config.lambda_limb_len, config.lambda_limb_cos_simi,
            config.lambda_limb_cos_simi_velocity)
        return total, (comps, new_state)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _grads_and_comps(params, state, x, y, weights, model_key):
        """Full-batch or microbatch-accumulated gradient of the SAME
        weighted-mean objective.

        With `config.grad_microbatch = m > 0` the batch is processed as a
        `lax.scan` over B/m chunks whose per-chunk gradients are combined
        with their real-sample weight sums — algebraically identical to the
        full-batch weighted mean (loss comps too). Each scan step runs its
        own forward+backward, so live activation memory is that of an
        m-clip backward: lighter remat policies (or none) fit HBM. Model
        state (GCN batch-norm) threads through the scan, giving
        per-microbatch statistics — the reference DataParallel's
        per-replica semantics (layers.batch_norm_nodes docstring)."""
        m = config.grad_microbatch
        b = x.shape[0]
        if not m or m >= b or b % m:
            (_, (comps, new_state)), grads = grad_fn(
                params, state, x, y, weights, model_key)
            return grads, comps, new_state

        n_micro = b // m
        xm = x.reshape(n_micro, m, *x.shape[1:])
        ym = y.reshape(n_micro, m, *y.shape[1:])
        wm = weights.reshape(n_micro, m)
        keys = jax.random.split(model_key, n_micro)

        def body(carry, chunk):
            state_c, grads_acc, comps_acc = carry
            xc, yc, wc, kc = chunk
            (_, (comps, state_n)), grads = grad_fn(
                params, state_c, xc, yc, wc, kc)
            sw = jnp.sum(wc)
            grads_acc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32) * sw, grads_acc, grads)
            # iterate over comps (not the accumulator) so a key mismatch
            # raises at trace time instead of silently dropping a component
            comps_acc = {k: comps_acc[k] + comps[k] * sw for k in comps}
            return (state_n, grads_acc, comps_acc), None

        grads0 = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        comps0 = {k: jnp.zeros((), jnp.float32)
                  for k in ("loss_mpjpe", "loss_n_mpjpe", "loss_velocity",
                            "loss_total")}
        # limb-loss comps join when their lambdas are nonzero
        if config.lambda_limb_len_var:
            comps0["loss_limb_len_var"] = jnp.zeros((), jnp.float32)
        if config.lambda_limb_len:
            comps0["loss_limb_len"] = jnp.zeros((), jnp.float32)
        if config.lambda_limb_cos_simi:
            comps0["loss_limb_len_cos_simi"] = jnp.zeros((), jnp.float32)
        if config.lambda_limb_cos_simi_velocity:
            comps0["loss_limb_len_cos_simi_velocity"] = jnp.zeros(
                (), jnp.float32)
        (new_state, grads, comps), _ = jax.lax.scan(
            body, (state, grads0, comps0), (xm, ym, wm, keys))
        denom = jnp.maximum(jnp.sum(weights), 1.0)
        grads = jax.tree.map(lambda g: g / denom, grads)
        comps = {k: v / denom for k, v in comps.items()}
        return grads, comps, new_state

    return _grads_and_comps


def make_train_step(model, config: Config, optimizer: optax.GradientTransformation):
    """One fused jitted step: gather -> augment -> forward -> loss -> grads
    -> AdamW. Under a mesh, sharding propagates from the donated params /
    batch shardings; gradient all-reduce rides ICI automatically."""
    grads_fn = make_grads_fn(model, config)

    def guarded_grads_fn(params, state, x, y, weights, model_key):
        """Under the default "outer" NaN-guard policy (docs/KNOBS.md): run
        the whole forward+backward with UNCHECKED fast sdpa kernels and put
        ONE lax.cond on isnan(loss_total) — an underflowed head's 0/0 NaN
        propagates through the forward to the loss, and the backward kernels
        (f32 exp) underflow strictly later than the forward's bf16-cast exp
        weights, so a clean loss implies clean grads. The per-call guard's
        104 conds/forward cost ~7% of the train step (measured round 5)."""
        from kasportsformer_tpu.ops.attention import _attn_guard, guard_scope

        if _attn_guard() != "outer":
            return grads_fn(params, state, x, y, weights, model_key)
        with guard_scope("off"):
            fast = grads_fn(params, state, x, y, weights, model_key)

        def redo(_):
            with guard_scope("stable"):
                return grads_fn(params, state, x, y, weights, model_key)

        return jax.lax.cond(jnp.isnan(fast[1]["loss_total"]),
                            redo, lambda _: fast, None)

    # params/state/opt_state are donated: the update happens in place on
    # device (halves the optimizer-state memory traffic; callers must thread
    # the returned pytrees, as the Trainer does). No-op on CPU.
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, state, opt_state, arrays, idx, weights, key):
        flip_key, model_key = jax.random.split(key)
        x = take_batch(arrays["inputs"], idx)
        y = take_batch(arrays["labels"], idx)
        if config.flip:
            x, y = random_flip_batch(flip_key, x, y)
        x = truncate_channels(x, config.input_channel_number)
        grads, comps, new_state = guarded_grads_fn(
            params, state, x, y, weights, model_key)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, comps

    return step


# ------------------------------------------------------------ trainer


class Trainer:
    """Epoch driver: train → evaluate → checkpoint → schedule → early-stop,
    with the reference's logging keys (SURVEY.md §5.5)."""

    def __init__(self, config: Config, model, train_set: ClipSet,
                 test_set: ClipSet, log=None, metric_sink=None, mesh=None):
        self.config = config
        self.model = model
        self.log = log or get_logger(config.logger_dir_path, config.logger_file_name)
        self.metric_sink = metric_sink  # callable(dict, step) — wandb-shaped
        self.mesh = mesh
        self.batch_sharding = None
        self.replicated = None
        if mesh is not None:
            from kasportsformer_tpu import parallel

            self.batch_sharding = parallel.batch_sharding(mesh)
            self.replicated = parallel.replicated(mesh)
            if config.batch_size % mesh.shape[parallel.DATA_AXIS]:
                raise ValueError(
                    f"batch_size {config.batch_size} not divisible by the "
                    f"data axis ({mesh.shape[parallel.DATA_AXIS]})")
        self.train_arrays = device_put_clipset(train_set,
                                               sharding=self.replicated)
        self.n_train = len(train_set)
        self.optimizer = make_optimizer(config)
        self.train_step = make_train_step(model, config, self.optimizer)
        eval_bs = config.eval_batch_size or config.batch_size
        self.evaluator = Evaluator(
            model, test_set, batch_size=eval_bs, flip=config.flip,
            input_channel_number=config.input_channel_number,
            batch_sharding=self.batch_sharding,
            array_sharding=self.replicated)

    def _shard_batch(self, arr: jnp.ndarray) -> jnp.ndarray:
        if self.batch_sharding is None:
            return arr
        return jax.device_put(arr, self.batch_sharding)

    def fit(self, params, state, epochs: int | None = None,
            epoch_start: int = 0, min_mpjpe: float = math.inf,
            opt_state=None, lr: float | None = None,
            scheduler_state: dict | None = None):
        """Run the epoch loop. For a resume, pass the restored `opt_state`,
        `lr` and `scheduler_state` from the checkpoint payload (see
        `resume_payload`) — otherwise a warm run would restart at the full
        un-decayed LR with fresh Adam moments."""
        config = self.config
        if self.replicated is not None:
            params = jax.device_put(params, self.replicated)
            state = jax.device_put(state, self.replicated)
        if opt_state is None:
            opt_state = self.optimizer.init(params)
        elif self.replicated is not None:
            opt_state = jax.device_put(opt_state, self.replicated)
        scheduler = ReduceLROnPlateau(factor=config.learning_rate_decay, patience=2)
        if scheduler_state is not None:
            scheduler.load_state_dict(scheduler_state)
        lr = config.learning_rate if lr is None else lr
        patience_count = 0
        best_epoch = epoch_start
        root_key = jax.random.key(config.seed)
        epochs = config.epochs if epochs is None else epochs

        for epoch in range(epoch_start, epochs):
            self.log.info(f"train epoch: {epoch + 1} ...")
            wu = warmup_lr(config, epoch)
            if wu is not None:
                lr = wu
            set_learning_rate(opt_state, lr)

            # the shuffle rng is seeded per (seed, epoch) — not one generator
            # advanced across the run — so a kill-and-resume at epoch E sees
            # the exact batch order the uninterrupted run would have
            # (tests/test_eval_train.py::test_resume_matches_uninterrupted)
            plan = epoch_plan(self.n_train, config.batch_size,
                              np.random.default_rng([config.seed, epoch]))
            epoch_key = jax.random.fold_in(root_key, epoch)
            t0 = time.time()
            # Loss components accumulate ON DEVICE across the epoch (a few
            # scalar adds per step, all async) and cross the host boundary
            # once per epoch. The reference — and round 1 here — fetched
            # every component every step (~30 ms/sync through a TPU tunnel,
            # `train_and_evaluate_sp.py:224-239`).
            totals: dict[str, jnp.ndarray] | None = None
            n_total = 0
            from kasportsformer_tpu import parallel

            for s in range(plan.steps):
                step_key = jax.random.fold_in(epoch_key, s)
                # tensor_parallel: trace-time dispatch of the attention cores
                # to the shard_map'd TP kernel when the 'model' axis is >1
                with parallel.tensor_parallel(self.mesh):
                    params, state, opt_state, comps = self.train_step(
                        params, state, opt_state,
                        self.train_arrays,
                        self._shard_batch(jnp.asarray(plan.indices[s])),
                        self._shard_batch(jnp.asarray(plan.weights[s])),
                        step_key)
                n_real = float(plan.weights[s].sum())  # host-side plan array
                n_total += n_real
                if totals is None:
                    totals = {k: v * n_real for k, v in comps.items()}
                else:
                    totals = {k: totals[k] + comps[k] * n_real
                              for k, v in comps.items()}
            loss_avgs = {k: float(v) / max(n_total, 1.0)
                         for k, v in (totals or {}).items()}  # one epoch sync
            train_time = time.time() - t0

            result = self.evaluator.run(params, state)
            mpjpe = result["mpjpe"]
            self.log.info(
                f"epoch {epoch + 1}: MPJPE {mpjpe} mm  P-MPJPE {result['p_mpjpe']} mm  "
                f"accel {result['acceleration_error']}  "
                f"loss {loss_avgs.get('loss_total', float('nan')):.5f}  "
                f"({plan.steps} steps in {train_time:.1f}s)")

            improved = mpjpe < min_mpjpe
            if improved:
                min_mpjpe = mpjpe
                patience_count = 0
                best_epoch = epoch
            else:
                patience_count += 1

            # scheduler steps only after warmup (`:393-397`) — and BEFORE
            # the checkpoint saves: the checkpoint must carry the lr and
            # plateau state the NEXT epoch needs, else a kill-and-resume
            # silently drops this epoch's scheduler step (the reference
            # saves pre-step, `train_and_evaluate_sp.py:350-358` vs
            # `:393-397`, one more latent resume bug fixed by construction)
            lr_used = lr  # logged: the lr this epoch actually trained with
            if not config.warmup or epoch > config.warmup_epoches:
                lr = scheduler.step(mpjpe, lr)

            interval = config.checkpoint_interval
            if interval > 0:
                if improved:
                    self._save(params, state, opt_state, scheduler, epoch,
                               lr, min_mpjpe, tag="best")
                if (epoch + 1) % interval == 0 or epoch == epochs - 1:
                    self._save(params, state, opt_state, scheduler, epoch,
                               lr, min_mpjpe, tag="latest")

            self._log_metrics(epoch, lr_used, loss_avgs, result, min_mpjpe)

            if patience_count >= config.training_epoch_patience:
                self.log.info(
                    f"No improvement for {patience_count} epochs, early stop. "
                    f"Min MPJPE {min_mpjpe} at epoch {best_epoch + 1}")
                break

        return params, state, {"min_mpjpe": min_mpjpe, "best_epoch": best_epoch}

    # -- helpers ---------------------------------------------------------
    def _log_metrics(self, epoch, lr, loss_avgs, result, min_mpjpe):
        payload = {
            "learning_rate": lr,
            # the reference's four keys always present; limb-loss keys join
            # when their lambdas are nonzero
            **{f"train/{k}": v for k, v in loss_avgs.items()},
            "eval/mpjpe": result["mpjpe"],
            "eval/p-mpjpe": result["p_mpjpe"],
            "eval/min_mpjpe": min_mpjpe,
            "eval/acceleration_error": result["acceleration_error"],
            "eval_additional/upper_body_mpjpe": result["upper_body_mpjpe"],
            "eval_additional/lower_body_mpjpe": result["lower_body_mpjpe"],
        }
        from kasportsformer_tpu.skeleton import JOINT_LABELS

        for j, label in enumerate(JOINT_LABELS):
            payload[f"eval_joint/{label}"] = float(result["mpjpe_joint"][j])
        for name, value in zip(result["activity_name_sequence"],
                               result["mpjpe_activity"]):
            payload[f"eval_activity/{name}"] = value
        if self.metric_sink is not None:
            self.metric_sink(payload, epoch + 1)

    def _save(self, params, state, opt_state, scheduler, epoch, lr,
              min_mpjpe, tag: str):
        directory = os.path.join(self.config.new_checkpoint_dir,
                                 f"{self.config.new_checkpoint_name}_{tag}")
        payload = {"params": params, "state": state, "opt_state": opt_state}
        ckpt.save_native(directory, 0, payload)
        # host metadata (incl. the wandb run id string) rides in a JSON
        # sidecar — one schema for save AND resume (the reference's saver and
        # resumer disagree on key names, SURVEY.md §5.4)
        meta = {
            "epoch": epoch + 1,
            "learning_rate": float(lr),
            "min_mpjpe": float(min_mpjpe),
            "scheduler_best": (scheduler.best if math.isfinite(scheduler.best)
                               else None),
            "scheduler_bad_epochs": scheduler.num_bad_epochs,
            "wandb_run_id": self.config.wandb_run_id or "",
        }
        import json

        with open(os.path.join(directory, "meta.json"), "w") as f:
            json.dump(meta, f)


def load_checkpoint_meta(directory: str) -> dict:
    import json

    with open(os.path.join(directory, "meta.json")) as f:
        return json.load(f)


def resume_kwargs(meta: dict, opt_state) -> dict:
    """Resume kwargs for `Trainer.fit` from a checkpoint's meta + restored
    optimizer state."""
    best = meta.get("scheduler_best")
    return {
        "epoch_start": int(meta["epoch"]),
        "min_mpjpe": float(meta["min_mpjpe"]),
        "opt_state": opt_state,
        "lr": float(meta["learning_rate"]),
        "scheduler_state": {
            "best": math.inf if best is None else float(best),
            "num_bad_epochs": int(meta["scheduler_bad_epochs"]),
        },
    }

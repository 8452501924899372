"""Training loop: jitted train/eval steps, metrics, fit, checkpointing.

Rebuild of the reference's ``src/train.rs``:

* ``Metrics``            — ``train.rs:9-71`` (per-epoch vectors + summary)
* ``Trainer``            — ``train.rs:74-95``
* ``train_epoch``        — ``train.rs:98-144``
* ``evaluate``           — ``train.rs:147-172`` (here truly grad-free:
  ``eval_step`` never builds a backward program, unlike the reference whose
  eval keeps recording tape nodes)
* ``fit``                — ``train.rs:175-261`` (scheduler + early stop)
* checkpoint save **and load** — the reference saves only (``:264-292``)
* ``quick_train_mnist``  — ``train.rs:296-312``
* ``test_samples`` / ``print_digit`` ASCII renderer — ``train.rs:315-378``

TPU design: ONE jitted XLA program per train step containing forward,
backward, and the (optionally Pallas-fused) optimizer update, with params
and optimizer state donated so updates happen in place in HBM.  Optional
``mesh`` enables data/tensor parallel execution via GSPMD shardings.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from taper_tpu import losses as L
from taper_tpu import optim as opt_mod
from taper_tpu import parallel
from taper_tpu.utils import checkpoint as ckpt


def _has_running_state(params) -> bool:
    """True when the parameter tree carries non-trainable running state
    (BatchNorm statistics; leaves under a ``running_``-prefixed key)."""
    paths = jax.tree_util.tree_flatten_with_path(params)[0]
    return any(any(opt_mod._leaf_key(p).startswith("running_")
                   for p in path)
               for path, _ in paths)


def _merge_running_state(params, new_state):
    """Take ``running_*`` leaves from ``new_state`` (produced by
    ``Module.apply_train``), everything else from ``params`` (produced by
    the optimizer, which masks running leaves out of updates)."""

    def rule(path, old, new):
        running = any(opt_mod._leaf_key(p).startswith("running_")
                      for p in path)
        return new if running else old

    return jax.tree_util.tree_map_with_path(rule, params, new_state)


def _make_grad_step(model, loss_fn, uses_rng: bool, stateful: bool):
    """Shared fwd+bwd: returns ``(loss, logits, new_state, grads)`` where
    ``new_state`` is the apply_train-updated tree (None when stateless)."""

    def compute(params, x, y, rng):
        def loss_of(p):
            kwargs = {"rng": rng} if uses_rng else {}
            if stateful:
                logits, new_p = model.apply_train(p, x, **kwargs)
            else:
                logits = model.apply(p, x, train=True, **kwargs)
                new_p = None
            return loss_fn(logits, y), (logits, new_p)

        (loss, (logits, new_p)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        return loss, logits, new_p, grads

    return compute


@dataclass
class Metrics:
    """Per-epoch history (the reference's ``Metrics`` vectors,
    ``train.rs:9-71``) + optional machine-readable JSONL logging: set
    ``log_path`` and every ``record`` appends one JSON line
    ``{ts, epoch, train_loss, train_acc, val_loss, val_acc, epoch_s}``
    — the greppable training log the reference's print!-only
    observability lacks (SURVEY.md §5.5)."""

    train_loss: List[float] = field(default_factory=list)
    train_acc: List[float] = field(default_factory=list)
    val_loss: List[float] = field(default_factory=list)
    val_acc: List[float] = field(default_factory=list)
    epoch_times: List[float] = field(default_factory=list)
    log_path: Optional[str] = None

    def record(self, tl, ta, vl, va, dt) -> None:
        self.train_loss.append(float(tl))
        self.train_acc.append(float(ta))
        self.val_loss.append(float(vl))
        self.val_acc.append(float(va))
        self.epoch_times.append(float(dt))
        if self.log_path:
            import json
            with open(self.log_path, "a") as f:
                f.write(json.dumps(
                    {"ts": time.time(),
                     "epoch": len(self.train_loss),
                     "train_loss": float(tl), "train_acc": float(ta),
                     "val_loss": float(vl), "val_acc": float(va),
                     "epoch_s": float(dt)}) + "\n")

    def print_last(self) -> None:
        e = len(self.train_loss)
        print(f"epoch {e:3d} | train loss {self.train_loss[-1]:.4f} "
              f"acc {self.train_acc[-1]*100:5.2f}% | val loss "
              f"{self.val_loss[-1]:.4f} acc {self.val_acc[-1]*100:5.2f}% | "
              f"{self.epoch_times[-1]:.2f}s")

    def plot_summary(self) -> None:
        if not self.val_acc:
            print("no epochs recorded")
            return
        best = max(self.val_acc)
        print("—" * 60)
        print(f"best val acc  : {best*100:.2f}%")
        print(f"final val acc : {self.val_acc[-1]*100:.2f}%")
        print(f"total time    : {sum(self.epoch_times):.2f}s "
              f"({np.mean(self.epoch_times):.2f}s/epoch)")
        print("—" * 60)


class Trainer:
    """Owns model + optimizer; compiles the fused train/eval steps."""

    def __init__(self, model, optimizer: opt_mod.Optimizer,
                 scheduler: Optional[opt_mod.LRScheduler] = None,
                 loss_fn: Callable = L.cross_entropy_loss,
                 seed: int = 0, mesh=None, tensor_parallel: bool = False,
                 zero1: bool = False, train_uses_rng: bool = False,
                 log_path: Optional[str] = None,
                 augment: Optional[Callable] = None):
        # ``augment(batch, key) -> batch`` runs INSIDE the scanned epoch
        # on the training batches only (eval sees raw images) — e.g.
        # ``data.augment.random_crop_flip``.
        self.augment = augment
        self.model = model
        self.optimizer = optimizer
        self.scheduler = scheduler
        self.loss_fn = loss_fn
        self.metrics = Metrics(log_path=log_path)
        self.mesh = mesh
        self.tensor_parallel = tensor_parallel
        # ZeRO-1: partition optimizer moments over the data axis (each DP
        # rank stores 1/N of m/v; XLA all-gathers fresh params per step).
        self.zero1 = zero1
        self.train_uses_rng = train_uses_rng
        # Epochs completed before this process (set by ``restore``) —
        # keeps checkpoint step numbering global across resumes.
        self._epoch_offset = 0

        self._init_state(seed)
        self._batch_sharding = (parallel.batch_sharding(mesh)
                                if mesh is not None else None)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _init_state(self, seed: int) -> None:
        """(Re)initialize params + optimizer state, sharded onto the mesh
        when one is configured — shared by __init__ and reset_parameters."""
        key = jax.random.PRNGKey(seed)
        self.init_key, self.dropout_key = jax.random.split(key)
        self.params = self.model.init(self.init_key)
        # Models with BatchNorm carry running stats that the train step
        # must thread through apply_train and merge after the update.
        self._stateful = _has_running_state(self.params)
        if self.mesh is not None:
            # Sharded params must keep the tree-form optimizer state: the
            # fused flat path would ravel (all-gather) the whole pytree
            # every step.  update() dispatches on the state representation,
            # so forcing tree-form at init pins the right path.
            from taper_tpu.ops import use_backend as _ub
            with _ub("xla"):
                self.opt_state = self.optimizer.init(self.params)
            p_shard = parallel.param_sharding(self.mesh, self.params,
                                              self.tensor_parallel)
            self.params = parallel.shard_params(self.params, p_shard)
            # Optimizer slots mirror the param shardings (plus ZeRO-1
            # data-axis partitioning when enabled); lr/step replicated.
            s_shard = parallel.optimizer_state_sharding(
                self.mesh, self.params, self.tensor_parallel, self.zero1)
            for slot in ("m", "v"):
                if slot in self.opt_state:
                    self.opt_state[slot] = parallel.shard_params(
                        self.opt_state[slot], s_shard)
            if "mask" in self.opt_state:
                self.opt_state["mask"] = parallel.shard_params(
                    self.opt_state["mask"], p_shard)
        else:
            self.opt_state = self.optimizer.init(self.params)
        self._step_count = 0

    # -- compiled steps ----------------------------------------------------

    def _build_train_step(self):
        optimizer = self.optimizer
        stateful = self._stateful
        compute = _make_grad_step(self.model, self.loss_fn,
                                  self.train_uses_rng, stateful)

        def step(params, opt_state, x, y, rng):
            loss, logits, new_p, grads = compute(params, x, y, rng)
            acc = L.accuracy(logits, y)
            params, opt_state = optimizer.update(grads, opt_state, params)
            if stateful:
                params = _merge_running_state(params, new_p)
            return params, opt_state, loss, acc

        return jax.jit(step, donate_argnums=(0, 1))

    def _build_eval_step(self):
        model, loss_fn = self.model, self.loss_fn

        def step(params, x, y, n_valid):
            logits = model.apply(params, x, train=False)
            # Per-sample losses so padded tail rows can be masked out
            # (static shapes: the pad-and-mask strategy from SURVEY.md §7).
            per_sample = jax.vmap(
                lambda lg, yy: loss_fn(lg[None], yy[None]))(logits, y)
            mask = jnp.arange(x.shape[0]) < n_valid
            loss_sum = jnp.sum(jnp.where(mask, per_sample, 0.0))
            preds = jnp.argmax(logits, axis=-1)
            correct = jnp.sum(jnp.where(
                mask, (preds == y.reshape(-1).astype(preds.dtype)), False))
            return loss_sum, correct

        return jax.jit(step)

    def _build_epoch_fn(self, batch_size: int, num_steps: int):
        """Whole-epoch train function: ``lax.scan`` over device-resident
        data — ONE dispatch per epoch (shuffle, forward, backward and the
        fused optimizer update all stay on-chip).

        This is the TPU-idiomatic replacement for the reference's per-batch
        eager loop (``train.rs:98-144``): host↔device latency is paid once
        per epoch instead of once per step, and metrics accumulate in
        device scalars.
        """
        optimizer = self.optimizer
        stateful = self._stateful
        augment = self.augment
        compute = _make_grad_step(self.model, self.loss_fn,
                                  self.train_uses_rng, stateful)

        def epoch(params, opt_state, images, labels, epoch_key):
            n = images.shape[0]
            perm = jax.random.permutation(epoch_key, n)
            idxs = perm[: num_steps * batch_size].reshape(
                num_steps, batch_size)

            def body(carry, step_in):
                params, opt_state, loss_sum, acc_sum = carry
                idx, step_i = step_in
                x = jnp.take(images, idx, axis=0)
                y = jnp.take(labels, idx, axis=0)
                rng = jax.random.fold_in(epoch_key, step_i)
                if augment is not None:
                    x = augment(x, jax.random.fold_in(rng, 0x5bdd))
                loss, logits, new_p, grads = compute(params, x, y, rng)
                params, opt_state = optimizer.update(grads, opt_state,
                                                     params)
                if stateful:
                    params = _merge_running_state(params, new_p)
                return (params, opt_state, loss_sum + loss,
                        acc_sum + L.accuracy(logits, y)), None

            init = (params, opt_state, jnp.float32(0.0), jnp.float32(0.0))
            (params, opt_state, loss_sum, acc_sum), _ = jax.lax.scan(
                body, init, (idxs, jnp.arange(num_steps)))
            return (params, opt_state, loss_sum / num_steps,
                    acc_sum / num_steps)

        return jax.jit(epoch, donate_argnums=(0, 1))

    def _build_eval_epoch_fn(self, batch_size: int, num_steps: int):
        """Whole-split eval in one dispatch (padded tail masked out)."""
        model, loss_fn = self.model, self.loss_fn

        def eval_epoch(params, images, labels, n_valid):
            def body(carry, i):
                loss_sum, correct = carry
                start = i * batch_size
                x = jax.lax.dynamic_slice_in_dim(images, start, batch_size)
                y = jax.lax.dynamic_slice_in_dim(labels, start, batch_size)
                logits = model.apply(params, x, train=False)
                per_sample = jax.vmap(
                    lambda lg, yy: loss_fn(lg[None], yy[None]))(logits, y)
                mask = start + jnp.arange(batch_size) < n_valid
                loss_sum += jnp.sum(jnp.where(mask, per_sample, 0.0))
                preds = jnp.argmax(logits, axis=-1)
                correct += jnp.sum(jnp.where(
                    mask, preds == y.reshape(-1).astype(preds.dtype),
                    False))
                return (loss_sum, correct), None

            (loss_sum, correct), _ = jax.lax.scan(
                body, (jnp.float32(0.0), jnp.int32(0)),
                jnp.arange(num_steps))
            return loss_sum, correct

        return jax.jit(eval_epoch)

    def _build_fit_program(self, n: int, batch_size: int, num_steps: int,
                           eval_batch_size: int, ev_steps: int, nv: int,
                           epochs: int, early_stop_acc: float,
                           with_lr_schedule: bool, unroll: int = 1):
        """ALL epochs — train scan, eval scan, early stop — as ONE jitted
        XLA program.  The host dispatches once and fetches the per-epoch
        metric vectors once; there are no per-epoch host syncs at all
        (each separate dispatch pays a host round-trip on this hardware,
        which dominated the round-1 MLP benchmark).

        Early stop is evaluated ON DEVICE: once val accuracy exceeds the
        threshold, the remaining epochs' bodies are skipped via
        ``lax.cond`` (their metrics report NaN, which the host trims).
        """
        model, optimizer, loss_fn = self.model, self.optimizer, self.loss_fn
        stateful = self._stateful
        augment = self.augment
        compute = _make_grad_step(model, loss_fn, self.train_uses_rng,
                                  stateful)

        def train_one_epoch(params, opt_state, epoch_key):
            perm = jax.random.permutation(epoch_key, n)
            idxs = perm[: num_steps * batch_size].reshape(
                num_steps, batch_size)

            def body(carry, step_in):
                params, opt_state, loss_sum, acc_sum, images, labels = carry
                idx, step_i = step_in
                x = jnp.take(images, idx, axis=0)
                y = jnp.take(labels, idx, axis=0)
                rng = jax.random.fold_in(epoch_key, step_i)
                if augment is not None:
                    x = augment(x, jax.random.fold_in(rng, 0x5bdd))
                loss, logits, new_p, grads = compute(params, x, y, rng)
                params, opt_state = optimizer.update(grads, opt_state,
                                                     params)
                if stateful:
                    params = _merge_running_state(params, new_p)
                return (params, opt_state, loss_sum + loss,
                        acc_sum + L.accuracy(logits, y), images, labels), None

            return body, idxs

        def eval_split(params, images, labels):
            def body(carry, i):
                loss_sum, correct = carry
                start = i * eval_batch_size
                x = jax.lax.dynamic_slice_in_dim(images, start,
                                                 eval_batch_size)
                y = jax.lax.dynamic_slice_in_dim(labels, start,
                                                 eval_batch_size)
                logits = model.apply(params, x, train=False)
                per_sample = jax.vmap(
                    lambda lg, yy: loss_fn(lg[None], yy[None]))(logits, y)
                mask = start + jnp.arange(eval_batch_size) < nv
                loss_sum += jnp.sum(jnp.where(mask, per_sample, 0.0))
                preds = jnp.argmax(logits, axis=-1)
                correct += jnp.sum(jnp.where(
                    mask, preds == y.reshape(-1).astype(preds.dtype),
                    False))
                return (loss_sum, correct), None

            (loss_sum, correct), _ = jax.lax.scan(
                body, (jnp.float32(0.0), jnp.int32(0)),
                jnp.arange(ev_steps))
            return loss_sum / nv, correct.astype(jnp.float32) / nv

        def program(params, opt_state, ti, tl, vi, vl, key, lrs):
            def epoch_step(carry, e):
                params, opt_state, done = carry

                def run(operand):
                    params, opt_state = operand
                    if with_lr_schedule:
                        opt_state = optimizer.set_lr(opt_state, lrs[e])
                    epoch_key = jax.random.fold_in(key, e)
                    body, idxs = train_one_epoch(params, opt_state,
                                                 epoch_key)
                    init = (params, opt_state, jnp.float32(0.0),
                            jnp.float32(0.0), ti, tl)
                    # unroll: tiny per-step programs (MLP) are dominated by
                    # while-loop iteration overhead; 8x unrolling measures
                    # ~25% faster end-to-end on v5e.  Big bodies (CNNs)
                    # keep unroll=1 — no win, much larger programs.
                    (params, opt_state, loss_sum, acc_sum, _, _), _ = (
                        jax.lax.scan(body, init,
                                     (idxs, jnp.arange(num_steps)),
                                     unroll=unroll))
                    va_loss, va_acc = eval_split(params, vi, vl)
                    return (params, opt_state, loss_sum / num_steps,
                            acc_sum / num_steps, va_loss, va_acc)

                def skip(operand):
                    params, opt_state = operand
                    nan = jnp.float32(jnp.nan)
                    return params, opt_state, nan, nan, nan, nan

                params, opt_state, tr_l, tr_a, va_l, va_a = jax.lax.cond(
                    done, skip, run, (params, opt_state))
                done = jnp.logical_or(done, va_a > early_stop_acc)
                return (params, opt_state, done), (tr_l, tr_a, va_l, va_a)

            (params, opt_state, _), metrics = jax.lax.scan(
                epoch_step, (params, opt_state, jnp.bool_(False)),
                jnp.arange(epochs))
            return params, opt_state, metrics

        return jax.jit(program, donate_argnums=(0, 1))

    def _precompute_lr_schedule(self, epochs: int):
        """Per-epoch lr array for metric-independent schedulers; epoch 0
        uses the scheduler's current lr (mirrors ``fit_device``'s
        step-after-epoch ordering)."""
        import copy

        if self.scheduler is None:
            return None
        if isinstance(self.scheduler, opt_mod.ReduceLROnPlateau):
            raise ValueError(
                "ReduceLROnPlateau needs per-epoch metrics on host; "
                "use fit_device instead of fit_device_fused")
        sim = copy.deepcopy(self.scheduler)
        lrs = [sim.lr]
        for _ in range(epochs - 1):
            lrs.append(sim.step(None))
        return np.asarray(lrs, np.float32)

    def fit_device_fused(self, train_images, train_labels, val_images,
                         val_labels, epochs: int, batch_size: int = 256,
                         early_stop_acc: float = 0.99, verbose: bool = True,
                         eval_batch_size: int = 2000,
                         checkpoint_path: Optional[str] = None,
                         unroll: int = 1) -> Metrics:
        """``fit_device`` with EVERY epoch fused into one XLA dispatch.

        The idiomatic end state of replacing the reference's eager loop
        (``train.rs:175-261``): one program trains, evaluates and early-
        stops across all epochs; the host fetches four metric vectors at
        the end.  Metric-independent schedulers are precomputed into a
        per-epoch lr array (``ReduceLROnPlateau`` is rejected — it needs
        host metrics; use :meth:`fit_device`).
        """
        lrs = self._precompute_lr_schedule(epochs)
        n = len(train_labels)
        num_steps = n // batch_size
        assert num_steps > 0, (n, batch_size)

        ti = jnp.asarray(train_images)
        tl = jnp.asarray(train_labels)
        nv = len(val_labels)
        eval_batch_size = min(eval_batch_size, nv)
        ev_steps = -(-nv // eval_batch_size)
        pad = ev_steps * eval_batch_size - nv
        vi = jnp.pad(jnp.asarray(val_images),
                     ((0, pad),) + ((0, 0),) * (val_images.ndim - 1))
        vl = jnp.pad(jnp.asarray(val_labels), (0, pad))
        if self._batch_sharding is not None:
            ti = jax.device_put(ti, self._batch_sharding)
            tl = jax.device_put(tl, self._batch_sharding)
            vi = jax.device_put(vi, self._batch_sharding)
            vl = jax.device_put(vl, self._batch_sharding)

        # Cache the jitted program: a rebuilt closure would retrace (and
        # redo the executable-cache lookup) on every fit call.
        sig = (n, batch_size, num_steps, eval_batch_size, ev_steps, nv,
               epochs, early_stop_acc, lrs is not None, unroll)
        if not hasattr(self, "_fit_programs"):
            self._fit_programs = {}
        program = self._fit_programs.get(sig)
        if program is None:
            program = self._build_fit_program(
                n, batch_size, num_steps, eval_batch_size, ev_steps, nv,
                epochs, early_stop_acc, with_lr_schedule=lrs is not None,
                unroll=unroll)
            self._fit_programs[sig] = program

        t0 = time.perf_counter()
        # Same per-epoch keys as fit_device: epoch_key = fold_in(key, e).
        key = self.dropout_key
        lr_arg = (jnp.asarray(lrs) if lrs is not None
                  else jnp.zeros((epochs,), jnp.float32))
        self.params, self.opt_state, (tr_l, tr_a, va_l, va_a) = program(
            self.params, self.opt_state, ti, tl, vi, vl, key, lr_arg)
        tr_l, tr_a, va_l, va_a = (np.asarray(tr_l), np.asarray(tr_a),
                                  np.asarray(va_l), np.asarray(va_a))
        dt = time.perf_counter() - t0

        epochs_run = int(np.sum(~np.isnan(va_a)))
        for e in range(epochs_run):
            self.metrics.record(tr_l[e], tr_a[e], va_l[e], va_a[e],
                                dt / epochs_run)
            if verbose:
                self.metrics.print_last()
        # Keep the host-side scheduler in sync with the epochs that ran.
        if self.scheduler is not None:
            for _ in range(epochs_run):
                self.scheduler.step(None)
            self.opt_state = self.optimizer.set_lr(
                self.opt_state, self.scheduler.get_lr())
        if verbose and epochs_run < epochs:
            print(f"early stop: val acc {va_a[epochs_run-1]*100:.2f}% > "
                  f"{early_stop_acc*100:.1f}%")
        if checkpoint_path:
            ckpt.save_checkpoint(
                checkpoint_path,
                {"params": self.params, "opt_state": self.opt_state},
                metadata={"epochs": epochs_run})
        return self.metrics

    def reset_parameters(self, seed: int = 0) -> None:
        """Fresh training run (params, optimizer state, metrics AND the
        host-side LR schedule) while reusing already-compiled programs of
        identical shapes."""
        self._init_state(seed)
        self.metrics = Metrics()
        if self.scheduler is not None:
            self.scheduler.reset()

    def fit_device(self, train_images, train_labels, val_images, val_labels,
                   epochs: int, batch_size: int = 256,
                   early_stop_acc: float = 0.99, verbose: bool = True,
                   eval_batch_size: int = 2000,
                   checkpoint_path: Optional[str] = None,
                   save_every: int = 1, resume: bool = False) -> Metrics:
        """``fit`` with the dataset resident on device and each epoch
        compiled to a single XLA program (scan over steps).

        With ``checkpoint_path``, params + optimizer state + epoch count are
        saved every ``save_every`` epochs, and ``resume=True`` continues an
        interrupted run from the last checkpoint (the resume capability the
        reference lacks — SURVEY.md §5.4).  The LR scheduler is fast-
        forwarded by the completed epoch count.
        """
        start_epoch = 0
        if resume and checkpoint_path and os.path.exists(checkpoint_path):
            self.load_checkpoint(checkpoint_path)
            _, meta = ckpt.load_checkpoint(
                checkpoint_path, {"params": self.params,
                                  "opt_state": self.opt_state})
            start_epoch = int(meta.get("epochs", 0))
            self._fast_forward_scheduler(start_epoch)
            if verbose and start_epoch:
                print(f"resumed from {checkpoint_path} "
                      f"at epoch {start_epoch}")
        n = len(train_labels)
        num_steps = n // batch_size
        assert num_steps > 0, (n, batch_size)

        ti = jnp.asarray(train_images)
        tl = jnp.asarray(train_labels)
        nv = len(val_labels)
        eval_batch_size = min(eval_batch_size, nv)
        ev_steps = -(-nv // eval_batch_size)
        pad = ev_steps * eval_batch_size - nv
        # jnp.pad keeps already-device-resident inputs on device (uploading
        # 60k MNIST images through a slow host link dominates otherwise).
        vi = jnp.pad(jnp.asarray(val_images),
                     ((0, pad),) + ((0, 0),) * (val_images.ndim - 1))
        vl = jnp.pad(jnp.asarray(val_labels), (0, pad))
        if self._batch_sharding is not None:
            ti = jax.device_put(ti, self._batch_sharding)
            tl = jax.device_put(tl, self._batch_sharding)
            vi = jax.device_put(vi, self._batch_sharding)
            vl = jax.device_put(vl, self._batch_sharding)

        epoch_fn = self._build_epoch_fn(batch_size, num_steps)
        eval_fn = self._build_eval_epoch_fn(eval_batch_size, ev_steps)

        for e in range(start_epoch, epochs):
            t0 = time.perf_counter()
            key = jax.random.fold_in(self.dropout_key, e)
            self.params, self.opt_state, tr_loss, tr_acc = epoch_fn(
                self.params, self.opt_state, ti, tl, key)
            loss_sum, correct = eval_fn(self.params, vi, vl, nv)
            va_loss = float(loss_sum) / nv
            va_acc = float(correct) / nv
            dt = time.perf_counter() - t0
            self.metrics.record(float(tr_loss), float(tr_acc), va_loss,
                                va_acc, dt)
            if verbose:
                self.metrics.print_last()
            if self.scheduler is not None:
                lr = self.scheduler.step(va_loss)
                self.opt_state = self.optimizer.set_lr(self.opt_state, lr)
            if checkpoint_path and (e + 1) % max(save_every, 1) == 0:
                ckpt.save_checkpoint(
                    checkpoint_path,
                    {"params": self.params, "opt_state": self.opt_state},
                    metadata={"epochs": e + 1})
            if va_acc > early_stop_acc:
                if verbose:
                    print(f"early stop: val acc {va_acc*100:.2f}% > "
                          f"{early_stop_acc*100:.1f}%")
                break
        return self.metrics

    # -- epoch loops -------------------------------------------------------

    def _device_batch(self, x, y):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
            y = jax.device_put(y, self._batch_sharding)
        return x, y

    def train_epoch(self, loader, log_every: int = 0) -> Dict[str, float]:
        # Per-step losses stay on device; the host syncs once at epoch end
        # (a per-step ``float(loss)`` would serialize on dispatch latency).
        losses, accs = [], []
        for i, (bx, by) in enumerate(loader):
            bx, by = self._device_batch(bx, by)
            self._step_count += 1
            rng = jax.random.fold_in(self.dropout_key, self._step_count)
            self.params, self.opt_state, loss, acc = self._train_step(
                self.params, self.opt_state, bx, by, rng)
            losses.append(loss)
            accs.append(acc)
            if log_every and (i + 1) % log_every == 0:
                print(f"  batch {i+1}/{len(loader)} "
                      f"loss {float(loss):.4f} acc {float(acc)*100:.2f}%")
        if not losses:
            return {"loss": 0.0, "acc": 0.0}
        return {"loss": float(jnp.mean(jnp.stack(losses))),
                "acc": float(jnp.mean(jnp.stack(accs)))}

    def evaluate(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int = 2048) -> Dict[str, float]:
        """Grad-free evaluation over a full split (fixed-size batches with a
        padded, masked tail so jit never recompiles)."""
        n = len(labels)
        batch_size = min(batch_size, n)
        tot_loss = 0.0
        tot_correct = 0.0
        for start in range(0, n, batch_size):
            bx = images[start:start + batch_size]
            by = labels[start:start + batch_size]
            count = len(by)
            if count < batch_size:
                # jnp.pad keeps device-resident inputs on device
                bx = jnp.pad(jnp.asarray(bx),
                             ((0, batch_size - count),)
                             + ((0, 0),) * (bx.ndim - 1))
                by = jnp.pad(jnp.asarray(by), (0, batch_size - count))
            bx, by = self._device_batch(bx, by)
            loss_sum, correct = self._eval_step(self.params, bx, by, count)
            tot_loss += float(loss_sum)
            tot_correct += float(correct)
        return {"loss": tot_loss / n, "acc": tot_correct / n}

    def fit(self, train_loader, val_images, val_labels, epochs: int,
            early_stop_acc: float = 0.99, log_every: int = 0,
            verbose: bool = True, ckpt_manager=None) -> Metrics:
        """Epoch loop: train, evaluate, schedule, optionally checkpoint.

        ``ckpt_manager`` (a :class:`utils.checkpoint.CheckpointManager`)
        saves {params, opt_state} after every epoch keyed by the GLOBAL
        epoch index (``restore``'s count + epochs this process), with
        val loss as the retention metric when the manager's mode is
        ``'min'`` and val accuracy when it is ``'max'`` — so
        ``keep_best`` preserves the best-validation epoch through
        rotation and ``async_save`` overlaps the write with the next
        epoch.
        """
        for _ in range(epochs):
            t0 = time.perf_counter()
            tr = self.train_epoch(train_loader, log_every=log_every)
            va = self.evaluate(val_images, val_labels)
            dt = time.perf_counter() - t0
            self.metrics.record(tr["loss"], tr["acc"], va["loss"],
                                va["acc"], dt)
            if verbose:
                self.metrics.print_last()
            if self.scheduler is not None:
                lr = self.scheduler.step(va["loss"])
                self.opt_state = self.optimizer.set_lr(self.opt_state, lr)
            if ckpt_manager is not None:
                epoch = self._epoch_offset + len(self.metrics.val_acc)
                metric = (va["acc"] if ckpt_manager.mode == "max"
                          else va["loss"])
                ckpt_manager.save(
                    epoch, {"params": self.params,
                            "opt_state": self.opt_state},
                    metadata={"epochs": float(epoch),
                              "val_acc": va["acc"]},
                    metric=metric)
            if va["acc"] > early_stop_acc:
                if verbose:
                    print(f"early stop: val acc {va['acc']*100:.2f}% > "
                          f"{early_stop_acc*100:.1f}%")
                break
        if ckpt_manager is not None:
            ckpt_manager.wait()
        return self.metrics

    # -- checkpointing -----------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        ckpt.save_checkpoint(path, {"params": self.params,
                                    "opt_state": self.opt_state},
                             metadata={"epochs": len(self.metrics.val_acc)})

    def load_checkpoint(self, path: str) -> None:
        tree, _ = ckpt.load_checkpoint(
            path, {"params": self.params, "opt_state": self.opt_state})
        self.params = jax.tree.map(jnp.asarray, tree["params"])
        self.opt_state = jax.tree.map(jnp.asarray, tree["opt_state"])

    def _fast_forward_scheduler(self, epochs: int) -> None:
        """Advance the LR scheduler past ``epochs`` completed epochs.

        Deterministic schedules recompute lr from the epoch count and
        push it into opt_state.  Metric-driven schedules
        (ReduceLROnPlateau) cannot be replayed without the metric
        history — their decayed lr is already in the LOADED opt_state,
        so only the epoch counter advances and the loaded lr is kept
        (pushing ``step(None)``'s value would reset lr to its initial
        value, undoing every plateau decay).
        """
        if self.scheduler is None or not epochs:
            return
        lr_loaded = self.optimizer.get_lr(self.opt_state)
        for _ in range(epochs):
            lr = self.scheduler.step(None)
        if isinstance(self.scheduler, opt_mod.ReduceLROnPlateau):
            self.scheduler.lr = lr_loaded
        else:
            self.opt_state = self.optimizer.set_lr(self.opt_state, lr)

    def restore(self, manager, step: Optional[int] = None) -> int:
        """Resume {params, opt_state} from a CheckpointManager.

        Loads ``step`` (default: latest committed in the manifest),
        fast-forwards the LR scheduler by the stored epoch count, and
        returns that epoch count — pass ``epochs - resumed`` to ``fit``
        to finish an interrupted run.  Subsequent ``fit(...,
        ckpt_manager=...)`` saves continue the GLOBAL epoch numbering,
        so rotation never resurrects pre-resume steps.
        """
        tree, meta = manager.restore(
            {"params": self.params, "opt_state": self.opt_state}, step=step)
        self.params = jax.tree.map(jnp.asarray, tree["params"])
        self.opt_state = jax.tree.map(jnp.asarray, tree["opt_state"])
        epochs = int(meta.get("epochs", 0))
        self._epoch_offset = epochs
        self._fast_forward_scheduler(epochs)
        return epochs


def quick_train_mnist(model, lr: float = 1e-3, epochs: int = 10,
                      batch_size: int = 256, data_dir: str = "data/mnist",
                      verbose: bool = True) -> Trainer:
    """Adam(wd=1e-4) + StepLR(10, 0.5) + fit — reference ``train.rs:296-312``."""
    from taper_tpu import data as data_mod

    train_ds = data_mod.MNISTDataset(train=True, data_dir=data_dir)
    test_ds = data_mod.MNISTDataset(train=False, data_dir=data_dir)
    loader = data_mod.DataLoader(train_ds, batch_size)
    optimizer = opt_mod.Adam(lr, weight_decay=1e-4)
    sched = opt_mod.StepLR(lr, step_size=10, gamma=0.5)
    trainer = Trainer(model, optimizer, scheduler=sched)
    trainer.fit(loader, test_ds.images, test_ds.labels, epochs,
                verbose=verbose)
    return trainer


def print_digit(image: np.ndarray) -> None:
    """ASCII renderer for a 784-vector digit (reference ``train.rs:345-378``)."""
    img = np.asarray(image).reshape(28, 28)
    chars = " .:-=+*#%@"
    for row in img:
        line = "".join(chars[min(int(v * (len(chars) - 1)), len(chars) - 1)]
                       for v in row)
        print(line)


def test_samples(trainer: Trainer, images: np.ndarray, labels: np.ndarray,
                 n: int = 5) -> None:
    """Print n sample digits with predicted vs true labels."""
    x = jnp.asarray(images[:n])
    logits = trainer.model.apply(trainer.params, x, train=False)
    preds = np.argmax(np.asarray(logits), axis=-1)
    for i in range(n):
        print_digit(images[i])
        print(f"predicted: {preds[i]}  true: {int(labels[i])}\n")

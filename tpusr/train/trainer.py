"""Supervised trainers for SRCNN / EDSR / VGG16 — optax + one jit'd step.

Lifecycle parity with the reference model classes (``SRCNN_model.py:62-109``,
``EDSR_model.py:140-187``, ``VGG16_model.py:111-166``): ``fit`` returns
(history, time_tracker, memory_tracker); EarlyStopping(val_loss) with
best-weight restore, ReduceLROnPlateau, Adam. The whole train step — forward,
loss, PSNR/SSIM metrics, grads, update — is one compiled XLA graph; batches
are sharded over the mesh's 'data' axis when a mesh is given (the reference
has no distributed path; this is the TPU-native upgrade).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpusr.metrics.image import psnr as psnr_fn, ssim as ssim_fn
from tpusr.train.callbacks import (
    EarlyStopping, EpochMemoryTracker, EpochTimeTracker, ReduceLROnPlateau,
)
from tpusr.dist.mesh import shard_batch, replicate


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    lr: jnp.ndarray  # mutable LR so ReduceLROnPlateau needs no recompile


@dataclasses.dataclass
class FitResult:
    history: dict
    time_tracker: EpochTimeTracker
    memory_tracker: EpochMemoryTracker
    state: TrainState


class SupervisedSRTrainer:
    """MSE regression trainer with PSNR/SSIM metrics (SRCNN/EDSR semantics)."""

    def __init__(self, model, learning_rate=1e-4, clipnorm=None, mesh=None,
                 loss: str = "mse", remat: bool = False,
                 compute_dtype: str | jnp.dtype = "float32"):
        self.model = model
        self.base_lr = learning_rate
        self.clipnorm = clipnorm
        self.mesh = mesh
        self.loss_name = loss
        self.remat = remat  # jax.checkpoint the forward: trade FLOPs for memory
        # Mixed precision, the TPU way: master params, optimizer state, loss,
        # and metrics stay float32; only the network forward (and therefore
        # the backward matmuls/convs) runs in `compute_dtype`. bfloat16 shares
        # float32's exponent range, so no loss scaling is needed (unlike fp16).
        # The reference trains pure float32 (no mixed-precision policy is set
        # anywhere in SRCNN_model.py / EDSR_model.py / VGG16_model.py), which
        # remains the parity default.
        self.compute_dtype = jnp.dtype(compute_dtype)
        self._build_steps()

    def _cast_in(self, tree):
        """Cast floating leaves to the compute dtype (no-op for float32)."""
        if self.compute_dtype == jnp.float32:
            return tree
        cdt = self.compute_dtype
        return jax.tree.map(
            lambda p: p.astype(cdt)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, tree)

    # ---- functional pieces -------------------------------------------------
    def init_state(self, sample_x, rng=None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        params = self.model.init(rng, jnp.zeros_like(sample_x[:1]))["params"]
        opt_state = self._opt_init(params)
        state = TrainState(params=params, opt_state=opt_state,
                           lr=jnp.asarray(self.base_lr, jnp.float32))
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        return state

    def _build_steps(self):
        model = self.model

        def opt_init(params):
            # scale_by_adam state only; lr applied separately each step
            return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8).init(params)

        self._opt_init = opt_init
        adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        clipnorm = self.clipnorm

        cast_in = self._cast_in
        fwd = lambda params, x: model.apply(
            {"params": cast_in(params)}, cast_in(x)).astype(jnp.float32)
        if self.remat:
            fwd = jax.checkpoint(fwd)
        loss_name = self.loss_name

        def per_example_loss(pred, target):
            axes = tuple(range(1, pred.ndim))
            if loss_name == "mse":
                return jnp.mean((pred - target) ** 2, axis=axes)
            return jnp.mean(jnp.abs(pred - target), axis=axes)

        def wmean(v, w):
            return jnp.sum(v * w) / jnp.sum(w)

        def train_step_w(state: TrainState, x, y, w):
            def loss_fn(params):
                pred = fwd(params, x)
                loss = wmean(per_example_loss(pred, y), w)
                return loss, pred

            (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            if clipnorm is not None:
                grads, _ = optax.clip_by_global_norm(clipnorm).update(grads, optax.EmptyState())
            updates, opt_state = adam.update(grads, state.opt_state, state.params)
            updates = jax.tree.map(lambda u: -state.lr * u, updates)
            params = optax.apply_updates(state.params, updates)
            metrics = {
                "loss": loss,
                "psnr": wmean(psnr_fn(y, pred), w),
                "ssim": wmean(ssim_fn(y, pred), w),
                "n": jnp.sum(w),
            }
            return state.replace(params=params, opt_state=opt_state), metrics

        def eval_step_w(state: TrainState, x, y, w):
            pred = fwd(state.params, x)
            return {
                "loss": wmean(per_example_loss(pred, y), w),
                "psnr": wmean(psnr_fn(y, pred), w),
                "ssim": wmean(ssim_fn(y, pred), w),
                "n": jnp.sum(w),
            }

        self._train_step_w = jax.jit(train_step_w, donate_argnums=(0,))
        self._eval_step_w = jax.jit(eval_step_w)

    # unweighted public steps (tests / direct users)
    def train_step(self, state, x, y):
        return self._train_step_w(state, x, y,
                                  self._ones_weights(x.shape[0]))

    def eval_step(self, state, x, y):
        return self._eval_step_w(state, x, y, self._ones_weights(x.shape[0]))

    def _ones_weights(self, n):
        w = jnp.ones((n,), jnp.float32)
        if self.mesh is not None:
            w = shard_batch(self.mesh, np.ones((n,), np.float32))
        return w

    # ---- keras-like lifecycle ----------------------------------------------
    def _batches(self, x, y, batch_size, rng, shuffle=True):
        """Yield (xb, yb, wb) with a STATIC batch shape: the trailing partial
        batch is padded by repeating its first row and masked out via wb, so
        Keras's train-on-the-trailing-batch semantics hold under a mesh
        (even shards) and on a single device (one compiled shape)."""
        n = x.shape[0]
        idx = rng.permutation(n) if shuffle else np.arange(n)
        for s in range(0, n, batch_size):
            sel = idx[s : s + batch_size]
            nb = sel.shape[0]
            if nb < batch_size:
                sel = np.concatenate([sel, np.repeat(sel[:1], batch_size - nb)])
            wb = (np.arange(batch_size) < nb).astype(np.float32)
            xb, yb = x[sel], y[sel]
            if self.mesh is not None:
                xb, yb, wb = shard_batch(self.mesh, xb, yb, wb)
            yield xb, yb, wb

    @staticmethod
    def _epoch_mean(vals, ns):
        """Aggregate per-batch means weighted by real (unmasked) row counts."""
        v = np.asarray(jax.device_get(vals), np.float64)
        n = np.asarray(jax.device_get(ns), np.float64)
        return float((v * n).sum() / n.sum())

    def fit(self, x_train, y_train, x_val, y_val, batch_size=16, epochs=50,
            es_patience=3, plateau_patience=2, plateau_factor=0.5, min_lr=1e-7,
            seed=42, verbose=True, state: TrainState | None = None,
            metrics_logger=None, prefetch: int = 2,
            checkpoint_dir: str | None = None,
            checkpoint_every: int = 0,
            checkpoint_offset: int = 0) -> FitResult:
        # continue from loaded/previous weights when given (Keras fit semantics)
        state = state if state is not None else self.init_state(x_train[:1])

        def fmt(epoch, train_m, val_m, st):
            return (f"epoch {epoch + 1}/{epochs} loss={train_m['loss']:.5f} "
                    f"psnr={train_m['psnr']:.2f} val_loss={val_m['loss']:.5f} "
                    f"val_psnr={val_m['psnr']:.2f} lr={float(st.lr):.2e}")

        return self._fit_loop(
            x_train, y_train, x_val, y_val, batch_size, epochs, es_patience,
            plateau_patience, plateau_factor, min_lr, seed, verbose, state,
            metrics_logger, prefetch, checkpoint_dir, checkpoint_every,
            checkpoint_offset, metric_keys=("loss", "psnr", "ssim"),
            train_fn=self._train_step_w, fmt_line=fmt)

    def _fit_loop(self, x_train, y_train, x_val, y_val, batch_size, epochs,
                  es_patience, plateau_patience, plateau_factor, min_lr, seed,
                  verbose, state, metrics_logger, prefetch, checkpoint_dir,
                  checkpoint_every, checkpoint_offset, metric_keys, train_fn,
                  fmt_line) -> FitResult:
        """The Keras-parity epoch loop shared by both trainers: train batches
        (prefetched), validation, trackers, history/logging, periodic async
        checkpoints, ReduceLROnPlateau, EarlyStopping with best-weight
        restore. ``train_fn(state, xb, yb, wb) -> (state, metrics)``."""
        from tpusr.data.prefetch import prefetch_iterator

        ckpt_handle = None  # most recent async periodic save
        rng = np.random.default_rng(seed)
        early = EarlyStopping(patience=es_patience)
        plateau = ReduceLROnPlateau(plateau_factor, plateau_patience, min_lr)
        tt, mt = EpochTimeTracker(), EpochMemoryTracker()
        history: dict[str, list] = {k: [] for k in (
            *metric_keys, *(f"val_{k}" for k in metric_keys), "lr",
            "epoch_time_sec")}

        for epoch in range(epochs):
            tt.begin_epoch()
            mt.begin_epoch()
            agg = {k: [] for k in metric_keys}
            ns = []
            for xb, yb, wb in prefetch_iterator(
                    self._batches(x_train, y_train, batch_size, rng), prefetch):
                state, m = train_fn(state, xb, yb, wb)
                for k in agg:
                    agg[k].append(m[k])
                ns.append(m["n"])
            train_m = {k: self._epoch_mean(v, ns) for k, v in agg.items()}

            vagg = {k: [] for k in metric_keys}
            vns = []
            for xb, yb, wb in self._batches(x_val, y_val, batch_size, rng,
                                            shuffle=False):
                m = self._eval_step_w(state, xb, yb, wb)
                for k in vagg:
                    vagg[k].append(m[k])
                vns.append(m["n"])
            val_m = {k: self._epoch_mean(v, vns) for k, v in vagg.items()}

            tt.end_epoch()
            mt.end_epoch()
            for k, v in train_m.items():
                history[k].append(v)
            for k, v in val_m.items():
                history[f"val_{k}"].append(v)
            history["lr"].append(float(state.lr))
            history["epoch_time_sec"].append(tt.epoch_times_sec[-1])
            if metrics_logger is not None:
                metrics_logger.log_epoch(epoch, {
                    **train_m, **{f"val_{k}": v for k, v in val_m.items()},
                    "lr": float(state.lr),
                    "epoch_time_sec": tt.epoch_times_sec[-1]})
            if verbose:
                print(fmt_line(epoch, train_m, val_m, state))

            if (checkpoint_dir is not None and checkpoint_every > 0
                    and (epoch + 1) % checkpoint_every == 0):
                # periodic resume point (full TrainState incl. optimizer);
                # device->host transfer + write overlap the next epoch.
                # Wait on the previous save first: one in flight at a time,
                # and an earlier save's failure surfaces here instead of
                # being silently dropped when the handle is replaced.
                # checkpoint_offset keeps epoch numbering monotonic across
                # --resume restarts (epoch_NNNN counts from the original run).
                from tpusr.train.checkpoint import save_checkpoint_async
                if ckpt_handle is not None:
                    ckpt_handle.wait()
                ep = checkpoint_offset + epoch + 1
                ckpt_handle = save_checkpoint_async(
                    checkpoint_dir, f"epoch_{ep:04d}", state,
                    metadata={"epoch": ep, "val_loss": val_m["loss"]})
            new_lr = plateau.update(val_m["loss"], float(state.lr))
            if new_lr != float(state.lr):
                state = state.replace(lr=jnp.asarray(new_lr, jnp.float32))
            if early.update(val_m["loss"], state.params):
                break

        if ckpt_handle is not None:
            ckpt_handle.wait()
        if early.best_state is not None:  # restore_best_weights
            state = state.replace(params=early.best_state)
        return FitResult(history, tt, mt, state)

    def evaluate(self, state: TrainState, x_test, y_test, batch_size=16):
        agg = {"loss": [], "psnr": [], "ssim": []}
        ns = []
        for xb, yb, wb in self._batches(x_test, y_test, batch_size,
                                        np.random.default_rng(0), shuffle=False):
            m = self._eval_step_w(state, xb, yb, wb)
            for k in agg:
                agg[k].append(m[k])
            ns.append(m["n"])
        return {k: self._epoch_mean(v, ns) for k, v in agg.items()}


class ClassifierTrainer(SupervisedSRTrainer):
    """Sparse-categorical-crossentropy + accuracy (VGG16_model.py semantics).

    Supports freezing the backbone: `trainable_predicate(path)` decides which
    params receive updates (reference: freeze all VGG16 conv layers unless the
    last N are unfrozen, VGG16_model.py:75-82).
    """

    def __init__(self, model, learning_rate=1e-3, mesh=None,
                 trainable_predicate: Callable[[tuple], bool] | None = None,
                 dropout_seed: int = 0, l2_reg: float = 0.0,
                 compute_dtype: str | jnp.dtype = "float32"):
        self.trainable_predicate = trainable_predicate
        self.dropout_seed = dropout_seed
        self.l2_reg = float(l2_reg)
        super().__init__(model, learning_rate=learning_rate, mesh=mesh,
                         compute_dtype=compute_dtype)

    def _build_steps(self):
        from tpusr.data.augment import random_augment_batch

        model = self.model
        cast_in = self._cast_in
        adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        pred_fn = self.trainable_predicate
        base_rng = jax.random.PRNGKey(self.dropout_seed)
        aug_rng = jax.random.PRNGKey(self.dropout_seed + 1)
        l2_reg = self.l2_reg

        def opt_init(params):
            return adam.init(params)

        self._opt_init = opt_init

        def mask_grads(grads, params):
            if pred_fn is None:
                return grads
            flat = jax.tree_util.tree_flatten_with_path(grads)[0]
            treedef = jax.tree_util.tree_structure(grads)
            vals = [g if pred_fn(tuple(getattr(p, "key", str(p)) for p in path))
                    else jnp.zeros_like(g)
                    for path, g in flat]
            return jax.tree_util.tree_unflatten(treedef, vals)

        def l2_penalty(params):
            # Keras parity: kernel_regularizer=l2(l2_reg) on the Dense-256
            # head only (VGG16_model.py:89-91) = l2_reg * sum(kernel**2),
            # included in both training and evaluate() losses.
            return l2_reg * jnp.sum(params["fc1"]["kernel"] ** 2)

        def wmean(v, w):
            return jnp.sum(v * w) / jnp.sum(w)

        def train_step_w(state: TrainState, x, y, w, step, augment: bool):
            xin = x
            if augment:
                # on-the-fly per-batch Keras-ImageDataGenerator-parity warps,
                # inside the compiled step (SURVEY L5 plan: jax prng ops)
                xin = random_augment_batch(jax.random.fold_in(aug_rng, step), x)

            def loss_fn(params):
                # augmentation warps run float32 above; only the network
                # forward (conv trunk + head) runs in the compute dtype
                probs = model.apply(
                    {"params": cast_in(params)}, cast_in(xin), True,
                    rngs={"dropout": jax.random.fold_in(base_rng, step)},
                ).astype(jnp.float32)
                logp = jnp.log(jnp.clip(probs, 1e-7, 1.0))
                ce = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
                loss = wmean(ce, w)
                if l2_reg > 0:
                    loss = loss + l2_penalty(params)
                return loss, probs

            (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            grads = mask_grads(grads, state.params)
            updates, opt_state = adam.update(grads, state.opt_state, state.params)
            # mask updates too: XLA fusion noise through adam's 1/(sqrt(nu)+eps)
            # would otherwise drift frozen params by ~1e-8/step
            updates = mask_grads(updates, state.params)
            updates = jax.tree.map(lambda u: -state.lr * u, updates)
            params = optax.apply_updates(state.params, updates)
            acc = wmean((jnp.argmax(probs, -1) == y).astype(jnp.float32), w)
            return (state.replace(params=params, opt_state=opt_state),
                    {"loss": loss, "accuracy": acc, "n": jnp.sum(w)})

        def eval_step_w(state: TrainState, x, y, w):
            probs = model.apply({"params": cast_in(state.params)},
                                cast_in(x)).astype(jnp.float32)
            logp = jnp.log(jnp.clip(probs, 1e-7, 1.0))
            ce = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            loss = wmean(ce, w)
            if l2_reg > 0:
                loss = loss + l2_penalty(state.params)
            acc = wmean((jnp.argmax(probs, -1) == y).astype(jnp.float32), w)
            return {"loss": loss, "accuracy": acc, "n": jnp.sum(w)}

        self._train_step_w = jax.jit(train_step_w, donate_argnums=(0,),
                                     static_argnums=(5,))
        self._eval_step_w = jax.jit(eval_step_w)

    def train_step(self, state, x, y, step):
        return self._train_step_w(state, x, y, self._ones_weights(x.shape[0]),
                                  step, False)

    def fit(self, x_train, y_train, x_val, y_val, batch_size=32, epochs=50,
            es_patience=3, plateau_patience=2, plateau_factor=0.5, min_lr=1e-7,
            seed=42, verbose=True, augment=False,
            state: TrainState | None = None, metrics_logger=None,
            prefetch: int = 2, checkpoint_dir: str | None = None,
            checkpoint_every: int = 0,
            checkpoint_offset: int = 0) -> FitResult:
        state = state if state is not None else self.init_state(x_train[:1])
        step = 0  # global step feeds the dropout/augmentation PRNG streams

        def train_fn(st, xb, yb, wb):
            nonlocal step
            st, m = self._train_step_w(st, xb, yb, wb,
                                       jnp.asarray(step, jnp.uint32), augment)
            step += 1
            return st, m

        def fmt(epoch, train_m, val_m, st):
            return (f"epoch {epoch + 1}/{epochs} loss={train_m['loss']:.4f} "
                    f"acc={train_m['accuracy']:.4f} "
                    f"val_acc={val_m['accuracy']:.4f}")

        return self._fit_loop(
            x_train, y_train, x_val, y_val, batch_size, epochs, es_patience,
            plateau_patience, plateau_factor, min_lr, seed, verbose, state,
            metrics_logger, prefetch, checkpoint_dir, checkpoint_every,
            checkpoint_offset, metric_keys=("loss", "accuracy"),
            train_fn=train_fn, fmt_line=fmt)

    def evaluate(self, state: TrainState, x_test, y_test, batch_size=32):
        agg = {"loss": [], "accuracy": []}
        ns = []
        for xb, yb, wb in self._batches(x_test, y_test, batch_size,
                                        np.random.default_rng(0), shuffle=False):
            m = self._eval_step_w(state, xb, yb, wb)
            for k in agg:
                agg[k].append(m[k])
            ns.append(m["n"])
        return {k: self._epoch_mean(v, ns) for k, v in agg.items()}

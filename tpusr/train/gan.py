"""ESRGAN adversarial trainer — one compiled step for both updates.

The reference runs an *eager* loop with two GradientTapes and >=3 generator
forwards per step (``ESRGAN_model.py:475-533,685-727``). Here the whole step —
D forward/backward/update, G forward/backward/update, spectral-norm power
iteration, per-step PSNR/SSIM — is a single jit'd XLA graph; batches shard
over the mesh 'data' axis, so the gradient psum rides ICI for free.

Loss parity (ESRGAN_model.py:401-533):
- D: BCE(real->1) + BCE(fake->0) on sigmoid outputs.
- G: BCE(fake->1) + 1.0 * VGG19-block5_conv4 perceptual MSE (on denormalized,
  caffe-preprocessed images) + 100.0 * pixel L1 + 1.0 * spectral L1 of FFT2
  magnitudes (over the trailing (W, C) axes — the reference's tf.signal.fft2d
  quirk, preserved).
- Adam, exponential staircase decay: G 1e-4, D 1e-5, x0.5 every 10k steps.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpusr.metrics.image import psnr as psnr_fn, ssim as ssim_fn
from tpusr.models.vgg import preprocess_caffe
from tpusr.train.callbacks import EpochMemoryTracker, EpochTimeTracker
from tpusr.dist.mesh import shard_batch, replicate

_EPS = 1e-7  # keras binary_crossentropy prob clipping


def _bce(y_true, y_pred):
    p = jnp.clip(y_pred, _EPS, 1.0 - _EPS)
    return jnp.mean(-(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p)))


def pixel_l1(hr_real, hr_fake):
    return jnp.mean(jnp.abs(hr_real - hr_fake))


def spectral_l1(hr_real, hr_fake):
    """L1 of FFT2 magnitudes over the trailing two axes (W, C) — preserves the
    reference's tf.signal.fft2d innermost-axes behavior (ESRGAN_model.py:461-473)."""
    real_mag = jnp.abs(jnp.fft.fft2(hr_real.astype(jnp.complex64)))
    fake_mag = jnp.abs(jnp.fft.fft2(hr_fake.astype(jnp.complex64)))
    return jnp.mean(jnp.abs(real_mag - fake_mag))


class GANState(struct.PyTreeNode):
    g_params: Any
    d_params: Any
    d_spectral: Any
    g_opt: Any
    d_opt: Any
    step: jnp.ndarray


@dataclasses.dataclass
class GANFitResult:
    epoch_losses: dict
    time_tracker: EpochTimeTracker
    memory_tracker: EpochMemoryTracker
    state: GANState


class ESRGANTrainer:
    def __init__(self, generator, discriminator, vgg_features, vgg_params,
                 g_lr=1e-4, d_lr=1e-5, decay_steps=10000, decay_rate=0.5,
                 adv_weight=1.0, perc_weight=1.0, pixel_weight=100.0,
                 spec_weight=1.0, mesh=None, remat: bool = False,
                 compute_dtype="float32"):
        self.generator = generator
        self.discriminator = discriminator
        self.vgg_features = vgg_features
        self.vgg_params = vgg_params
        self.mesh = mesh
        self.remat = remat  # jax.checkpoint the G forward in the G-loss
        # Mixed precision: bfloat16 runs the FLOP-heavy forwards (generator
        # and the frozen VGG19 perceptual extractor) on the MXU's fast path;
        # master params, optimizer state, every loss term, and the
        # discriminator (with its spectral-norm power iteration, which is
        # numerically delicate and a negligible share of step FLOPs) stay
        # float32. The reference trains pure float32 — parity default.
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.weights = (adv_weight, perc_weight, pixel_weight, spec_weight)
        self.g_sched = optax.exponential_decay(g_lr, decay_steps, decay_rate,
                                               staircase=True)
        self.d_sched = optax.exponential_decay(d_lr, decay_steps, decay_rate,
                                               staircase=True)
        self.g_tx = optax.adam(self.g_sched, b1=0.9, b2=0.999)
        self.d_tx = optax.adam(self.d_sched, b1=0.9, b2=0.999)
        self._build_steps()

    def init_state(self, lr_shape, hr_shape, rng=None) -> GANState:
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        rg, rd = jax.random.split(rng)
        g_vars = self.generator.init(rg, jnp.zeros((1,) + tuple(lr_shape)))
        d_vars = self.discriminator.init(rd, jnp.zeros((1,) + tuple(hr_shape)))
        state = GANState(
            g_params=g_vars["params"],
            d_params=d_vars["params"],
            d_spectral=d_vars["spectral"],
            g_opt=self.g_tx.init(g_vars["params"]),
            d_opt=self.d_tx.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        return state

    def _cast_in(self, tree):
        """Cast floating leaves to the compute dtype (no-op for float32)."""
        if self.compute_dtype == jnp.float32:
            return tree
        cdt = self.compute_dtype
        return jax.tree.map(
            lambda p: p.astype(cdt)
            if jnp.issubdtype(p.dtype, jnp.floating) else p, tree)

    def _perceptual(self, hr_real, hr_fake):
        """VGG19 feature MSE on denormalized inputs (ESRGAN_model.py:401-431)."""
        def feats(x):
            x255 = (x + 1.0) * 127.5
            return self.vgg_features.apply(
                {"params": self._cast_in(self.vgg_params)},
                self._cast_in(preprocess_caffe(x255))).astype(jnp.float32)
        fr = feats(hr_real)
        ff = feats(hr_fake)
        return jnp.mean((fr - ff) ** 2)

    def g_loss_components(self, g_params, d_params, d_spectral, lr, hr):
        """All four generator loss terms (shared by train/val/eval paths)."""
        g_fwd = lambda p, z: self.generator.apply(
            {"params": self._cast_in(p)},
            self._cast_in(z)).astype(jnp.float32)
        if self.remat:
            g_fwd = jax.checkpoint(g_fwd)
        fake = g_fwd(g_params, lr)
        d_fake = self.discriminator.apply(
            {"params": d_params, "spectral": d_spectral}, fake)
        adv = _bce(jnp.ones_like(d_fake), d_fake)
        perc = self._perceptual(hr, fake)
        pix = pixel_l1(hr, fake)
        spec = spectral_l1(hr, fake)
        wa, wp, wx, ws = self.weights
        total = wa * adv + wp * perc + wx * pix + ws * spec
        return total, {"adv": adv, "perc": perc, "pixel": pix, "spec": spec,
                       "fake": fake}

    def _build_steps(self):
        gen, disc = self.generator, self.discriminator
        g_tx, d_tx = self.g_tx, self.d_tx

        def train_step(state: GANState, lr, hr):
            # ---- discriminator update (one power iteration refreshes u) ----
            def d_loss_fn(d_params):
                fake = gen.apply(
                    {"params": self._cast_in(state.g_params)},
                    self._cast_in(lr)).astype(jnp.float32)
                d_real, mut = disc.apply(
                    {"params": d_params, "spectral": state.d_spectral}, hr, True,
                    mutable=["spectral"])
                d_fake = disc.apply(
                    {"params": d_params, "spectral": mut["spectral"]}, fake)
                loss = (_bce(jnp.ones_like(d_real), d_real)
                        + _bce(jnp.zeros_like(d_fake), d_fake))
                return loss, (mut["spectral"], fake)

            (d_loss, (new_spectral, fake_d)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params)
            d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
            d_params = optax.apply_updates(state.d_params, d_updates)
            new_spectral = jax.lax.stop_gradient(new_spectral)

            # ---- generator update ----
            def g_loss_fn(g_params):
                total, aux = self.g_loss_components(
                    g_params, d_params, new_spectral, lr, hr)
                return total, aux

            (g_loss, aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params)
            g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
            g_params = optax.apply_updates(state.g_params, g_updates)

            # ---- per-step metrics (reference computes these every step) ----
            hr01 = (hr + 1.0) / 2.0
            fake01 = (aux["fake"] + 1.0) / 2.0
            metrics = {
                "g_loss": g_loss,
                "d_loss": d_loss,
                "psnr": jnp.mean(psnr_fn(hr01, fake01)),
                "ssim": jnp.mean(ssim_fn(hr01, fake01)),
            }
            new_state = GANState(g_params=g_params, d_params=d_params,
                                 d_spectral=new_spectral, g_opt=g_opt,
                                 d_opt=d_opt, step=state.step + 1)
            return new_state, metrics

        def val_step(state: GANState, lr, hr):
            g_loss, aux = self.g_loss_components(
                state.g_params, state.d_params, state.d_spectral, lr, hr)
            hr01 = (hr + 1.0) / 2.0
            fake01 = (aux["fake"] + 1.0) / 2.0
            return {
                "g_loss": g_loss,
                "psnr": jnp.mean(psnr_fn(hr01, fake01)),
                "ssim": jnp.mean(ssim_fn(hr01, fake01)),
            }

        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.val_step = jax.jit(val_step)

    def _val_batches(self, x, y, batch_size, normalize):
        """Yield (n_real, xb, yb) including the partial tail (the reference's
        tf.data ``.batch`` keeps it, ESRGAN_model.py:782-856); each distinct
        tail shape compiles once and is reused every epoch. A tail that
        doesn't divide the mesh runs replicated (correct, just unsharded)."""
        n = len(x)
        for s in range(0, n, batch_size):
            xb, yb = x[s:s + batch_size], y[s:s + batch_size]
            if normalize:
                xb, yb = xb * 2.0 - 1.0, yb * 2.0 - 1.0
            nb = len(xb)
            if self.mesh is not None and nb % self.mesh.shape["data"] == 0:
                xb, yb = shard_batch(self.mesh, xb, yb)
            yield nb, xb, yb

    # ------------------------------------------------------------------ fit
    def fit(self, x_train, y_train, x_val=None, y_val=None, epochs=10,
            batch_size=16, steps_per_epoch=None, normalize=True, save_dir=None,
            seed=42, verbose=True, state=None, prefetch: int = 2,
            checkpoint_dir: str | None = None,
            checkpoint_every: int = 0,
            checkpoint_offset: int = 0) -> GANFitResult:
        """Train on [0,1] arrays (normalized to [-1,1] like ESRGAN_model.py:596-598).
        Saves a 5x5 SR preview grid per epoch when save_dir is given, and an
        async full-GANState resume point every ``checkpoint_every`` epochs
        when ``checkpoint_dir`` is given."""
        from tpusr.data.prefetch import prefetch_iterator

        rng = np.random.default_rng(seed)
        ckpt_handle = None
        n = x_train.shape[0]
        if steps_per_epoch is None:
            steps_per_epoch = max(1, n // batch_size)
        if state is None:
            # seed also selects the init weights, not just the batch stream
            # (two seeded runs must be independent trials)
            state = self.init_state(x_train.shape[1:], y_train.shape[1:],
                                    rng=jax.random.PRNGKey(seed))

        # Shuffle WITHOUT replacement, matching the reference's
        # tf.data shuffle->batch->repeat stream (ESRGAN_model.py:578-598):
        # a persistent permutation stream, reshuffled when exhausted; the
        # partial tail is dropped on reshuffle (static batch shape).
        perm = rng.permutation(n)
        pos = 0

        def next_batch_idx():
            nonlocal perm, pos
            if batch_size >= n:  # keep static batch shape on tiny datasets
                reps = -(-batch_size // n)
                return np.concatenate(
                    [rng.permutation(n) for _ in range(reps)])[:batch_size]
            if pos + batch_size > n:
                perm, pos = rng.permutation(n), 0
            sel = perm[pos:pos + batch_size]
            pos += batch_size
            return sel

        tt, mt = EpochTimeTracker(), EpochMemoryTracker()
        epoch_losses: dict[str, list] = {}
        preview = x_train[:25] if x_val is None or len(x_val) == 0 else x_val[:25]

        for epoch in range(epochs):
            tt.begin_epoch()
            mt.begin_epoch()
            agg = {"g_loss": [], "d_loss": [], "psnr": [], "ssim": []}

            def epoch_batches():
                for _ in range(steps_per_epoch):
                    sel = next_batch_idx()
                    xb, yb = x_train[sel], y_train[sel]
                    if normalize:
                        xb, yb = xb * 2.0 - 1.0, yb * 2.0 - 1.0
                    if self.mesh is not None:
                        xb, yb = shard_batch(self.mesh, xb, yb)
                    yield xb, yb

            for xb, yb in prefetch_iterator(epoch_batches(), prefetch):
                state, m = self.train_step(state, xb, yb)
                for k in agg:
                    agg[k].append(m[k])
            train_m = {k: float(np.mean(jax.device_get(v))) for k, v in agg.items()}

            val_m = {}
            if x_val is not None and len(x_val):
                vagg = {"g_loss": [], "psnr": [], "ssim": []}
                sizes = []
                for nb, xb, yb in self._val_batches(x_val, y_val, batch_size,
                                                    normalize):
                    m = self.val_step(state, xb, yb)
                    for k in vagg:
                        vagg[k].append(m[k])
                    sizes.append(nb)
                val_m = {f"val_{k}": float(np.average(
                             np.asarray(jax.device_get(v), np.float64),
                             weights=sizes))
                         for k, v in vagg.items()}

            if save_dir is not None:
                self._save_sr_grid(state, preview, save_dir, epoch + 1, normalize)
            if (checkpoint_dir is not None and checkpoint_every > 0
                    and (epoch + 1) % checkpoint_every == 0):
                # see SupervisedSRTrainer.fit: wait bounds in-flight saves
                # to one and surfaces earlier write failures; offset keeps
                # numbering monotonic across --resume restarts
                from tpusr.train.checkpoint import save_checkpoint_async
                if ckpt_handle is not None:
                    ckpt_handle.wait()
                ep = checkpoint_offset + epoch + 1
                ckpt_handle = save_checkpoint_async(
                    checkpoint_dir, f"epoch_{ep:04d}", state,
                    metadata={"epoch": ep, "g_loss": train_m["g_loss"]})

            tt.end_epoch()
            mt.end_epoch()
            for k, v in {**train_m, **val_m}.items():
                epoch_losses.setdefault(k, []).append(v)
            epoch_losses.setdefault("g_lr", []).append(
                float(self.g_sched(int(jax.device_get(state.step)))))
            epoch_losses.setdefault("d_lr", []).append(
                float(self.d_sched(int(jax.device_get(state.step)))))
            if verbose:
                msg = (f"epoch {epoch + 1}/{epochs} g={train_m['g_loss']:.3f} "
                       f"d={train_m['d_loss']:.3f} psnr={train_m['psnr']:.2f} "
                       f"ssim={train_m['ssim']:.4f}")
                if val_m:
                    msg += f" val_psnr={val_m['val_psnr']:.2f}"
                print(msg)

        if ckpt_handle is not None:
            ckpt_handle.wait()
        return GANFitResult(epoch_losses, tt, mt, state)

    def evaluate(self, state: GANState, x_test, y_test, batch_size=16,
                 normalize=True):
        """avg PSNR/SSIM/G-loss over the test set (ESRGAN_model.py:782-856)."""
        agg = {"g_loss": [], "psnr": [], "ssim": []}
        sizes = []
        for nb, xb, yb in self._val_batches(x_test, y_test, batch_size,
                                            normalize):
            m = self.val_step(state, xb, yb)
            for k in agg:
                agg[k].append(m[k])
            sizes.append(nb)
        out = {k: float(np.average(np.asarray(jax.device_get(v), np.float64),
                                   weights=sizes))
               for k, v in agg.items()}
        return {"avg_psnr": out["psnr"], "avg_ssim": out["ssim"],
                "avg_g_loss": out["g_loss"]}

    def _save_sr_grid(self, state, preview01, save_dir, epoch_idx, normalize):
        """5x5 generator preview PNG per epoch (ESRGAN_model.py:652-678)."""
        import os
        from PIL import Image

        os.makedirs(save_dir, exist_ok=True)
        lr_in = preview01 * 2.0 - 1.0 if normalize else preview01
        # params stay on device (a full-tree device_get per epoch costs
        # minutes over the dev tunnel); the jitted forward compiles once
        if not hasattr(self, "_preview_fn"):
            self._preview_fn = jax.jit(
                lambda p, x: self.generator.apply({"params": p}, x))
        sr = np.asarray(self._preview_fn(state.g_params, jnp.asarray(lr_in)))
        sr = (sr + 1.0) / 2.0
        n = min(25, sr.shape[0])
        rows = cols = 5
        h, w, ch = sr.shape[1:]
        grid = np.zeros((rows * h, cols * w, ch), np.uint8)
        for i in range(n):
            r, c = divmod(i, cols)
            tile = (np.clip(sr[i], 0, 1) * 255.0).round().astype(np.uint8)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = tile
        Image.fromarray(grid).save(
            os.path.join(save_dir, f"epoch_{epoch_idx:03d}_sr_grid.png"))

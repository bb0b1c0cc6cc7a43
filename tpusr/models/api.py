"""Reference-shaped lifecycle facades.

The reference exposes one class per model with a uniform contract —
``setup_model`` -> ``fit`` -> ``evaluate`` -> ``super_resolve_image`` /
``classify_defects_method`` -> ``save`` (``SRCNN_model.py``, ``EDSR_model.py``,
``ESRGAN_model.py``, ``VGG16_model.py``). These facades present that exact
surface over the tpusr functional core, so reference users can switch without
relearning the API. Checkpoints: ``from_pretrained`` accepts either a tpusr
orbax directory or a reference Keras ``.h5`` (imported weight-for-weight).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.config import RANDOM_SEED
from tpusr.models.srcnn import SRCNN
from tpusr.models.edsr import EDSR as EDSRModule
from tpusr.models.esrgan import ESRGANGenerator, ESRGANDiscriminator
from tpusr.models.vgg import VGG16Classifier, VGG19Features
from tpusr.pipeline.inference import srcnn_super_resolve, super_resolve_image
from tpusr.pipeline.defect_pipeline import classify_defects
from tpusr.train.trainer import SupervisedSRTrainer, ClassifierTrainer
from tpusr.train.gan import ESRGANTrainer
from tpusr.train.checkpoint import save_checkpoint, restore_checkpoint, load_metadata


def _is_h5(path):
    return isinstance(path, str) and path.endswith((".h5", ".hdf5"))


def _bound_fn(obj, cache_attr, params, build):
    """Cache a params-bound apply fn on the facade, keyed on params identity.

    Fresh lambdas per call would defeat the compiled-fn cache in
    tpusr.pipeline.inference (keyed on id(apply_fn)) — every
    super_resolve_image/classify call would re-trace. Invalidates whenever the
    facade's state (and thus the params object) is replaced."""
    cached = getattr(obj, cache_attr, None)
    if cached is None or cached[0] is not params:
        cached = (params, build(params))
        setattr(obj, cache_attr, cached)
    return cached[1]


def _saved_arch(pretrained_path):
    """Architecture config stored in a facade checkpoint's sidecar, if any."""
    if pretrained_path is None or _is_h5(pretrained_path):
        return None
    meta = load_metadata(os.path.dirname(pretrained_path) or ".",
                         os.path.basename(pretrained_path))
    return (meta or {}).get("arch")


class SRCNNModel:
    """SRCNN lifecycle parity with ``SRCNN_model.py:18-260``."""

    def __init__(self, mesh=None):
        self.module = SRCNN()
        self.trainer = None
        self.state = None
        self.mesh = mesh
        self._trained = False

    def setup_model(self, input_shape=(24, 24, 3), learning_rate=1e-4,
                    from_pretrained=False, pretrained_path=None,
                    compute_dtype="float32"):
        self.trainer = SupervisedSRTrainer(self.module,
                                           learning_rate=learning_rate,
                                           mesh=self.mesh,
                                           compute_dtype=compute_dtype)
        sample = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
        self.state = self.trainer.init_state(sample,
                                             jax.random.PRNGKey(RANDOM_SEED))
        if from_pretrained:
            if pretrained_path is None or not os.path.exists(pretrained_path):
                raise FileNotFoundError(
                    f"Pretrained model file not found at {pretrained_path}")
            if _is_h5(pretrained_path):
                from tpusr.train.keras_import import import_srcnn
                params = import_srcnn(self.state.params, pretrained_path)
                self.state = self.state.replace(params=params)
            else:
                self.state = restore_checkpoint(
                    os.path.dirname(pretrained_path) or ".",
                    os.path.basename(pretrained_path), self.state)
            self._trained = True

    def fit(self, X_train, Y_train, X_val, Y_val, batch_size=16, epochs=50):
        if self.trainer is None:
            raise ValueError("Model has not been set up.")
        res = self.trainer.fit(X_train, Y_train, X_val, Y_val,
                               batch_size=batch_size, epochs=epochs,
                               es_patience=3, plateau_patience=2,
                               state=self.state)
        self.state = res.state
        self._trained = True
        return res.history, res.time_tracker, res.memory_tracker

    def evaluate(self, X_test, Y_test):
        if not self._trained:
            raise RuntimeError("Model has not been trained.")
        ev = self.trainer.evaluate(self.state, X_test, Y_test)
        print(f"Loss: {ev['loss']:.4f}, PSNR: {ev['psnr']:.2f} dB, "
              f"SSIM: {ev['ssim']:.4f}")
        return [ev["loss"], ev["psnr"], ev["ssim"]]

    def super_resolve_image(self, lr_img, hr_h, hr_w, patch_size=33, stride=14,
                            interpolation="bicubic"):
        if not self._trained:
            raise RuntimeError("Model has not been trained.")
        apply_fn = _bound_fn(
            self, "_apply_cache", self.state.params,
            lambda params: lambda p: self.module.apply({"params": params}, p))
        return srcnn_super_resolve(apply_fn, lr_img, hr_h, hr_w,
                                   patch_size=patch_size, stride=stride,
                                   interpolation=interpolation)

    def save(self, directory, timestamp):
        if not self._trained:
            raise RuntimeError("Cannot save an untrained model.")
        if not directory:
            raise ValueError("Directory path must be provided.")
        path = save_checkpoint(directory, f"SRCNN_{timestamp}", self.state)
        print(f"Model saved to {path}")
        return path

    def save_h5(self, directory, timestamp):
        """Export to the reference's Keras ``.h5`` format
        (``SRCNN_{ts}.h5``, SRCNN_model.py:249-259) — loadable with
        ``keras.models.load_model`` and re-importable bit-exactly."""
        import os
        from tpusr.train.keras_export import export_srcnn

        if not self._trained:
            raise RuntimeError("Cannot save an untrained model.")
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"SRCNN_{timestamp}.h5")
        export_srcnn(self.state.params, path)
        return path


class EDSR:
    """EDSR lifecycle parity with ``EDSR_model.py:23-330``."""

    def __init__(self, mesh=None):
        self.module = None
        self.trainer = None
        self.state = None
        self.scale_factor = None
        self.mesh = mesh
        self.trained = False

    def setup_model(self, scale_factor=2, channels=3, num_res_blocks=16,
                    num_filters=64, res_scaling=0.1, learning_rate=1e-4,
                    loss="mean_squared_error", from_pretrained=False,
                    pretrained_path=None, compute_dtype="float32"):
        if from_pretrained:
            arch = _saved_arch(pretrained_path)
            if arch:  # the checkpoint knows its own architecture
                scale_factor = arch.get("scale_factor", scale_factor)
                channels = arch.get("channels", channels)
                num_res_blocks = arch.get("num_res_blocks", num_res_blocks)
                num_filters = arch.get("num_filters", num_filters)
                res_scaling = arch.get("res_scaling", res_scaling)
        self.scale_factor = scale_factor
        self._arch = {"scale_factor": scale_factor, "channels": channels,
                      "num_res_blocks": num_res_blocks,
                      "num_filters": num_filters, "res_scaling": res_scaling}
        self.module = EDSRModule(scale_factor=scale_factor, channels=channels,
                                 num_res_blocks=num_res_blocks,
                                 num_filters=num_filters,
                                 res_scaling=res_scaling)
        # the reference compiles MSE regardless of the loss arg (EDSR_model.py:137)
        self.trainer = SupervisedSRTrainer(self.module,
                                           learning_rate=learning_rate,
                                           clipnorm=1.0, mesh=self.mesh,
                                           loss="mse",
                                           compute_dtype=compute_dtype)
        sample = jnp.zeros((1, 24, 24, channels), jnp.float32)
        self.state = self.trainer.init_state(sample,
                                             jax.random.PRNGKey(RANDOM_SEED))
        if from_pretrained:
            if pretrained_path is None or not os.path.exists(pretrained_path):
                raise FileNotFoundError(
                    f"Pretrained model file not found at {pretrained_path}")
            if _is_h5(pretrained_path):
                from tpusr.train.keras_import import import_edsr
                params = import_edsr(self.state.params, pretrained_path,
                                     num_res_blocks=num_res_blocks,
                                     scale_factor=scale_factor)
                self.state = self.state.replace(params=params)
            else:
                self.state = restore_checkpoint(
                    os.path.dirname(pretrained_path) or ".",
                    os.path.basename(pretrained_path), self.state)
            self.trained = True

    def fit(self, X_train, Y_train, X_val, Y_val, batch_size=16, epochs=300):
        if self.module is None:
            raise ValueError("Model is not built yet.")
        res = self.trainer.fit(X_train, Y_train, X_val, Y_val,
                               batch_size=batch_size, epochs=epochs,
                               es_patience=5, plateau_patience=3,
                               state=self.state)
        self.state = res.state
        self.trained = True
        return res.history, res.time_tracker, res.memory_tracker

    def evaluate(self, X_test, Y_test):
        if not self.trained:
            raise RuntimeError("Model has not been trained.")
        ev = self.trainer.evaluate(self.state, X_test, Y_test)
        print(f"Loss: {ev['loss']:.4f}, PSNR: {ev['psnr']:.2f} dB, "
              f"SSIM: {ev['ssim']:.4f}")
        return [ev["loss"], ev["psnr"], ev["ssim"]]

    def super_resolve_image(self, lr_img, patch_size_lr=48, stride=24):
        if not self.trained:
            raise RuntimeError("Model has not been trained.")
        if self.scale_factor is None:
            raise ValueError("scale_factor is not set. Call setup_model first.")
        apply_fn = _bound_fn(
            self, "_apply_cache", self.state.params,
            lambda params: lambda p: self.module.apply({"params": params}, p))
        return super_resolve_image(apply_fn, lr_img, patch_size_lr=patch_size_lr,
                                   stride=stride, scale=self.scale_factor)

    def save(self, directory, timestamp):
        if not self.trained:
            raise RuntimeError("Cannot save an untrained model.")
        if not directory:
            raise ValueError("Directory path must be provided.")
        path = save_checkpoint(directory,
                               f"EDSR_x{self.scale_factor}_{timestamp}",
                               self.state, metadata={"arch": self._arch})
        print(f"Model saved to {path}")
        return path

    def save_h5(self, directory, timestamp):
        """Export to the reference's Keras ``.h5`` format
        (``EDSR_x{s}_{ts}.h5``, EDSR_model.py:317-330)."""
        import os
        from tpusr.train.keras_export import export_edsr

        if not self.trained:
            raise RuntimeError("Cannot save an untrained model.")
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory,
                            f"EDSR_x{self.scale_factor}_{timestamp}.h5")
        export_edsr(self.state.params, path,
                    res_scaling=self._arch.get("res_scaling", 0.1))
        return path


class ESRGAN:
    """ESRGAN lifecycle parity with ``ESRGAN_model.py:81-996``."""

    def __init__(self, mesh=None):
        self.generator = None
        self.discriminator = None
        self.vgg_model = None
        self.trainer = None
        self.state = None
        self.scale_factor = None
        self.mesh = mesh
        self.trained = False

    def setup_model(self, scale_factor=2, growth_channels=32,
                    num_rrdb_blocks=23, input_shape=(24, 24, 3),
                    output_shape=(48, 48, 3), from_trained=False,
                    generator_pretrained_path=None,
                    discriminator_pretrained_path=None,
                    vgg19_weights_path=None, compute_dtype="float32"):
        if from_trained:
            arch = _saved_arch(generator_pretrained_path)
            if arch:
                scale_factor = arch.get("scale_factor", scale_factor)
                growth_channels = arch.get("growth_channels", growth_channels)
                num_rrdb_blocks = arch.get("num_rrdb_blocks", num_rrdb_blocks)
                # keep the SR geometry consistent with the restored scale
                # (output is always input*scale; a stale caller-provided
                # output_shape would mis-size the exported discriminator)
                output_shape = (input_shape[0] * scale_factor,
                                input_shape[1] * scale_factor,
                                input_shape[2])
        self.scale_factor = scale_factor
        self.output_shape = tuple(output_shape)
        self._arch = {"scale_factor": scale_factor,
                      "growth_channels": growth_channels,
                      "num_rrdb_blocks": num_rrdb_blocks}
        self.generator = ESRGANGenerator(scale_factor=scale_factor,
                                         growth_channels=growth_channels,
                                         num_rrdb_blocks=num_rrdb_blocks)
        self.discriminator = ESRGANDiscriminator()
        self.vgg_model = VGG19Features()
        vgg_params = self.vgg_model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1,) + tuple(output_shape)))["params"]
        if vgg19_weights_path:
            from tpusr.tools.imagenet_weights import load_backbone_weights
            vgg_params = load_backbone_weights(vgg_params, vgg19_weights_path,
                                               "vgg19")
        self.trainer = ESRGANTrainer(self.generator, self.discriminator,
                                     self.vgg_model, vgg_params,
                                     mesh=self.mesh,
                                     compute_dtype=compute_dtype)
        self.state = self.trainer.init_state(input_shape, output_shape,
                                             jax.random.PRNGKey(RANDOM_SEED))
        if from_trained:
            if (generator_pretrained_path is None
                    or not os.path.exists(generator_pretrained_path)):
                raise FileNotFoundError("Generator pretrained path does not "
                                        f"exist: {generator_pretrained_path}")
            if _is_h5(generator_pretrained_path):
                # the reference reloads BOTH networks to resume adversarial
                # training (ESRGAN_model.py:137-149)
                if (discriminator_pretrained_path is None
                        or not os.path.exists(discriminator_pretrained_path)):
                    raise FileNotFoundError(
                        "Discriminator pretrained path does not exist: "
                        f"{discriminator_pretrained_path}")
                from tpusr.train.keras_import import (
                    import_esrgan_discriminator, import_esrgan_generator)
                g_params = import_esrgan_generator(self.state.g_params,
                                                   generator_pretrained_path)
                d_params, d_spec = import_esrgan_discriminator(
                    self.state.d_params, self.state.d_spectral,
                    discriminator_pretrained_path)
                self.state = self.state.replace(g_params=g_params,
                                                d_params=d_params,
                                                d_spectral=d_spec)
            else:
                # orbax checkpoints hold the full GANState (G+D+spectral+opts)
                self.state = restore_checkpoint(
                    os.path.dirname(generator_pretrained_path) or ".",
                    os.path.basename(generator_pretrained_path), self.state)
            self.trained = True

    def fit(self, X_train=None, Y_train=None, X_val=None, Y_val=None,
            epochs=100, batch_size=16, steps_per_epoch=None, normalize=True,
            save_dir=None):
        if X_train is None or Y_train is None:
            raise ValueError("Must provide (X_train, Y_train)")
        res = self.trainer.fit(X_train, Y_train, X_val, Y_val, epochs=epochs,
                               batch_size=batch_size,
                               steps_per_epoch=steps_per_epoch,
                               normalize=normalize, save_dir=save_dir,
                               state=self.state)
        self.state = res.state
        self.trained = True
        return res.epoch_losses, res.time_tracker, res.memory_tracker

    def evaluate(self, X_test, Y_test, batch_size=16):
        if not self.trained:
            raise RuntimeError("Model has not been trained.")
        return self.trainer.evaluate(self.state, X_test, Y_test,
                                     batch_size=batch_size)

    def super_resolve_image(self, lr_img, patch_size_lr=48, stride=24,
                            batch_size=16):
        if not self.trained:
            raise RuntimeError("Model has not been trained or loaded.")
        apply_fn = _bound_fn(
            self, "_apply_cache", self.state.g_params,
            lambda params: lambda p: self.generator.apply({"params": params}, p))
        return super_resolve_image(apply_fn, lr_img, patch_size_lr=patch_size_lr,
                                   stride=stride, scale=self.scale_factor,
                                   normalize_pm1=True)

    def super_resolve_full_image(self, lr_img, attention_block_size=4096):
        """Full-image SR: the whole image through the generator in one graph
        (no patch decomposition / overlap-add — TPU-native extension of
        ``ESRGAN_model.py:858-979``). Attention memory is bounded by
        blockwise online-softmax, or by ring attention over ``self.mesh``
        when one is set (see ``tpusr.pipeline.super_resolve_full_image``).
        Returns (sr_img in [0,1], metrics dict)."""
        from tpusr.pipeline.inference import super_resolve_full_image

        if not self.trained:
            raise RuntimeError("Model has not been trained or loaded.")
        return super_resolve_full_image(
            self.generator, {"params": self.state.g_params}, lr_img,
            mesh=self.mesh, attention_block_size=attention_block_size)

    def save(self, directory, timestamp):
        if not self.trained:
            raise RuntimeError("Cannot save an untrained model.")
        path = save_checkpoint(
            directory, f"ESRGAN_x{self.scale_factor}_{timestamp}", self.state,
            metadata={"arch": self._arch})
        print(f"Generator+discriminator state saved to {path}")
        return path

    def save_h5(self, directory, timestamp):
        """Export generator + discriminator to the reference's two-file
        Keras ``.h5`` format (``ESRGAN_{generator,discriminator}_x{s}_{ts}
        .h5``, ESRGAN_model.py:981-996). Returns (gen_path, disc_path)."""
        import os
        from tpusr.train.keras_export import (export_esrgan_discriminator,
                                              export_esrgan_generator)

        if not self.trained:
            raise RuntimeError("Cannot save an untrained model.")
        os.makedirs(directory, exist_ok=True)
        s = self.scale_factor
        g_path = os.path.join(directory,
                              f"ESRGAN_generator_x{s}_{timestamp}.h5")
        d_path = os.path.join(directory,
                              f"ESRGAN_discriminator_x{s}_{timestamp}.h5")
        export_esrgan_generator(self.state.g_params, g_path)
        export_esrgan_discriminator(self.state.d_params,
                                    self.state.d_spectral, d_path,
                                    input_hw=self.output_shape[0])
        return g_path, d_path


class FineTunedVGG16:
    """VGG16 defect-classifier lifecycle parity with ``VGG16_model.py:16-281``."""

    def __init__(self, mesh=None):
        self.module = None
        self.trainer = None
        self.state = None
        self.input_shape = None
        self.mesh = mesh
        self.trained = False

    def setup_model(self, input_shape=(128, 128, 3), num_classes=2,
                    train_last_n_layers=4, base_trainable=False,
                    dropout_rate=0.2, l2_reg=0.0, learning_rate=1e-3,
                    loss="sparse_categorical_crossentropy",
                    from_pretrained=False, pretrained_path=None,
                    imagenet_weights_path=None, compute_dtype="float32"):
        if from_pretrained:
            arch = _saved_arch(pretrained_path)
            if arch:
                input_shape = tuple(arch.get("input_shape", input_shape))
                num_classes = arch.get("num_classes", num_classes)
                dropout_rate = arch.get("dropout_rate", dropout_rate)
        assert input_shape[-1] == 3, "Input must have 3 channels (RGB)."
        if loss != "sparse_categorical_crossentropy":
            raise ValueError(
                f"Unsupported loss {loss!r}: only "
                "'sparse_categorical_crossentropy' is implemented "
                "(the reference compiles exactly this, VGG16_model.py:102)")
        self.input_shape = tuple(input_shape)
        self._arch = {"input_shape": list(self.input_shape),
                      "num_classes": num_classes, "dropout_rate": dropout_rate}
        self.module = VGG16Classifier(num_classes=num_classes,
                                      dropout_rate=dropout_rate)
        pred = None
        if not base_trainable:
            pred = lambda path: path[0] != "vgg16"
        elif train_last_n_layers > 0:
            # unfreeze the last N backbone conv layers (VGG16_model.py:79-82)
            names = [f"block{b}_conv{c}"
                     for b, n, _ in ((1, 2, 0), (2, 2, 0), (3, 3, 0),
                                     (4, 3, 0), (5, 3, 0))
                     for c in range(1, n + 1)]
            trainable = set(names[-train_last_n_layers:])
            pred = lambda path: (path[0] != "vgg16" or path[1] in trainable)
        self.trainer = ClassifierTrainer(self.module,
                                         learning_rate=learning_rate,
                                         mesh=self.mesh,
                                         trainable_predicate=pred,
                                         l2_reg=l2_reg,
                                         compute_dtype=compute_dtype)
        sample = jnp.zeros((1,) + self.input_shape, jnp.float32)
        self.state = self.trainer.init_state(sample,
                                             jax.random.PRNGKey(RANDOM_SEED))
        if imagenet_weights_path:
            from tpusr.tools.imagenet_weights import load_backbone_weights
            params = load_backbone_weights(self.state.params,
                                           imagenet_weights_path, "vgg16")
            self.state = self.state.replace(params=params)
        if from_pretrained:
            # .h5 checkpoints are files; orbax checkpoints are directories
            if pretrained_path is None or not os.path.exists(pretrained_path):
                raise FileNotFoundError(
                    f"Pretrained model file not found at {pretrained_path}")
            if _is_h5(pretrained_path):
                from tpusr.train.keras_import import import_vgg16_classifier
                params = import_vgg16_classifier(self.state.params,
                                                 pretrained_path)
                self.state = self.state.replace(params=params)
            else:
                self.state = restore_checkpoint(
                    os.path.dirname(pretrained_path) or ".",
                    os.path.basename(pretrained_path), self.state)
            self.trained = True

    def fit(self, X_train, y_train, X_val, y_val, batch_size=32, epochs=50,
            use_augmentation=True):
        if self.module is None:
            raise ValueError("Model is not built yet.")
        # augmentation happens per-batch inside the compiled train step
        # (Keras ImageDataGenerator parity — see tpusr.data.augment)
        res = self.trainer.fit(X_train, y_train, X_val, y_val,
                               batch_size=batch_size, epochs=epochs,
                               augment=use_augmentation, state=self.state)
        self.state = res.state
        self.trained = True
        return res.history

    def evaluate(self, X_test, y_test):
        if not self.trained:
            raise RuntimeError("Model has not been trained.")
        ev = self.trainer.evaluate(self.state, X_test, y_test)
        print(f"Loss: {ev['loss']:.4f}, Accuracy: {ev['accuracy']:.4f}")
        return [ev["loss"], ev["accuracy"]]

    def classify_defects_method(self, image, patch_size=None, stride=None,
                                batch_size=32):
        if self.module is None:
            raise ValueError("Model is not built yet.")
        if not self.trained:  # same guard as evaluate(): random-init weights
            raise RuntimeError("Model has not been trained.")
        if image is None:
            raise ValueError("image must be provided")
        img = np.asarray(image)
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError("image must be HxWx3 RGB array")
        if patch_size is None:
            patch_size = int(self.input_shape[0])
        clf = _bound_fn(
            self, "_apply_cache", self.state.params,
            lambda params: lambda p: self.module.apply({"params": params}, p))
        return classify_defects(clf, img, patch=patch_size, stride=stride)

    def save(self, directory, timestamp):
        if not self.trained:
            raise RuntimeError("Cannot save an untrained model.")
        path = save_checkpoint(directory, f"VGG16_{timestamp}", self.state,
                               metadata={"arch": self._arch})
        print(f"Model saved to {path}")
        return path

    def save_h5(self, directory, timestamp):
        """Export to the reference's Keras ``.h5`` format
        (``VGG16_{ts}.h5``, VGG16_model.py:272-281)."""
        import os
        from tpusr.train.keras_export import export_vgg16_classifier

        if not self.trained:
            raise RuntimeError("Cannot save an untrained model.")
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"VGG16_{timestamp}.h5")
        export_vgg16_classifier(self.state.params, path,
                                input_shape=self.input_shape)
        return path


def augment_classification_set(x, y, seed=RANDOM_SEED):
    """One-shot dataset doubling via the Keras-parity warp ops.

    Training-time parity lives in the train step (``ClassifierTrainer`` with
    ``augment=True`` warps every batch on the fly, like
    ``ImageDataGenerator.flow`` in VGG16_model.py:129-140); this helper
    remains for offline dataset expansion only.
    """
    from tpusr.data.augment import random_augment_batch

    x = jnp.asarray(x, jnp.float32)
    out = random_augment_batch(jax.random.PRNGKey(seed), x)
    return (np.concatenate([np.asarray(x), np.asarray(out)]),
            np.concatenate([y, y]))

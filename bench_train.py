"""Training-throughput benchmark vs the reference's epoch times.

Reference headline numbers (BASELINE.md, single unnamed GPU):
- SRCNN: 8,436 steps/epoch (batch 32, 24x24 patches) in ~36-50 s
- EDSR x2: 4,520 steps/epoch (batch 16, 24->48 patches) in ~127-206 s

This measures the tpusr jit'd train steps at the same batch/patch geometry
on one TPU chip and reports the epoch-equivalent wall time. Methodology:
steps chain inside one jit (`fori_loop`) so tunnel RTT is amortized, and
timing ends with a one-element device->host transfer — on the axon tunnel
``block_until_ready`` can return before the TPU finishes (observed: chained
train steps "timed" far past peak FLOPs without it). Chain results are
bit-identical to the same number of individually dispatched steps (verified
during development). Prints one JSON line per model.
"""

import json
import time

import numpy as np


def bench_supervised(name, model, batch, x_hw, y_hw, steps_per_epoch,
                     ref_epoch_s, n_chain=100, reps=3,
                     compute_dtype="float32"):
    import jax
    import jax.numpy as jnp
    from tpusr.train.trainer import SupervisedSRTrainer

    trainer = SupervisedSRTrainer(model, learning_rate=1e-4,
                                  compute_dtype=compute_dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, *x_hw, 3), np.float32))
    y = jnp.asarray(rng.random((batch, *y_hw, 3), np.float32))
    state = trainer.init_state(x[:1])

    def chain(state, x, y):
        return jax.lax.fori_loop(
            0, n_chain, lambda i, st: trainer.train_step(st, x, y)[0], state)

    jchain = jax.jit(chain)
    hard_sync = lambda st: np.asarray(
        jax.tree.leaves(st.params)[0].ravel()[0])  # slice on device, 1-elem transfer

    state = jchain(state, x, y)
    hard_sync(state)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = jchain(state, x, y)
        hard_sync(state)
        best = min(best, (time.perf_counter() - t0) / n_chain)
    epoch_s = best * steps_per_epoch
    print(json.dumps({
        "model": name, "batch": batch, "dtype": compute_dtype,
        "step_us": round(best * 1e6, 1),
        "epoch_equivalent_s": round(epoch_s, 2),
        "reference_epoch_s": ref_epoch_s,
        "speedup_vs_reference_low": round(ref_epoch_s[0] / epoch_s, 1),
    }))


def bench_classifier(n_chain=20, reps=3, compute_dtype="float32"):
    """VGG16 fine-tune step at the reference geometry (96x96 defect patches,
    batch 32, frozen backbone except the last 4 conv layers,
    VGG16_model.py:75-82,168-206). The reference publishes no epoch time for
    VGG16, so this reports step time only — f32 vs bf16 is the point."""
    import jax
    import jax.numpy as jnp
    from tpusr.models import VGG16Classifier
    from tpusr.train.trainer import ClassifierTrainer

    names = [f"block{b}_conv{c}" for b, n in ((1, 2), (2, 2), (3, 3),
                                              (4, 3), (5, 3))
             for c in range(1, n + 1)]
    trainable = set(names[-4:])
    pred = lambda path: (path[0] != "vgg16" or path[1] in trainable)
    trainer = ClassifierTrainer(VGG16Classifier(num_classes=2),
                                learning_rate=1e-3, trainable_predicate=pred,
                                compute_dtype=compute_dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((32, 96, 96, 3), np.float32))
    y = jnp.asarray(rng.integers(0, 2, 32))
    w = jnp.ones((32,), jnp.float32)
    state = trainer.init_state(x[:1])

    def chain(state, x, y):
        return jax.lax.fori_loop(
            0, n_chain,
            lambda i, st: trainer._train_step_w(
                st, x, y, w, i.astype(jnp.uint32), False)[0],
            state)

    jchain = jax.jit(chain)
    hard_sync = lambda st: np.asarray(
        jax.tree.leaves(st.params)[0].ravel()[0])  # slice on device, 1-elem transfer
    state = jchain(state, x, y)
    hard_sync(state)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = jchain(state, x, y)
        hard_sync(state)
        best = min(best, (time.perf_counter() - t0) / n_chain)
    print(json.dumps({
        "model": "vgg16_finetune_step", "batch": 32, "dtype": compute_dtype,
        "step_ms": round(best * 1e3, 2),
        "steps_per_sec": round(1.0 / best, 1),
    }))


def bench_gan(n_chain=50, reps=3, compute_dtype="float32"):
    """ESRGAN adversarial step at the notebook config (scale 2, growth 8,
    4 RRDB blocks, batch 16, 24->48 patches). The reference dispatches this
    eagerly from Python with >= 3 generator forwards per step
    (ESRGAN_model.py:475-533,713-721); here D-update + G-update + metrics
    are one compiled graph with a single G forward per update."""
    import jax
    import jax.numpy as jnp
    from tpusr.models import (ESRGANDiscriminator, ESRGANGenerator,
                              VGG19Features)
    from tpusr.train.gan import ESRGANTrainer

    rng = np.random.default_rng(0)
    gen = ESRGANGenerator(scale_factor=2, growth_channels=8, num_rrdb_blocks=4)
    disc = ESRGANDiscriminator()
    vgg = VGG19Features()
    vgg_params = vgg.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 48, 48, 3)))["params"]
    trainer = ESRGANTrainer(gen, disc, vgg, vgg_params,
                            compute_dtype=compute_dtype)
    state = trainer.init_state((24, 24, 3), (48, 48, 3))
    x = jnp.asarray(rng.random((16, 24, 24, 3), np.float32) * 2 - 1)
    y = jnp.asarray(rng.random((16, 48, 48, 3), np.float32) * 2 - 1)

    def chain(state, x, y):
        return jax.lax.fori_loop(
            0, n_chain, lambda i, st: trainer.train_step(st, x, y)[0], state)

    jchain = jax.jit(chain)
    hard_sync = lambda st: np.asarray(
        jax.tree.leaves(st.g_params)[0].ravel()[0])  # slice on device, 1-elem transfer
    state = jchain(state, x, y)
    hard_sync(state)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = jchain(state, x, y)
        hard_sync(state)
        best = min(best, (time.perf_counter() - t0) / n_chain)
    print(json.dumps({
        "model": "esrgan_gan_step", "batch": 16, "dtype": compute_dtype,
        "step_ms": round(best * 1e3, 2),
        "steps_per_sec": round(1.0 / best, 1),
        "note": "one fused D+G graph, 1 G-forward per update vs the "
                "reference's >=3 eager forwards per step",
    }))


def main():
    import os

    from tpusr.models import EDSR, SRCNN

    dtypes = ("float32", "bfloat16")
    if os.environ.get("BENCH_TRAIN_DTYPE"):  # e.g. BENCH_TRAIN_DTYPE=bfloat16
        dtypes = (os.environ["BENCH_TRAIN_DTYPE"],)
    for dt in dtypes:
        # SRCNN: pre-upscaled 24x24 patches, batch 32, 8,436 steps/epoch
        bench_supervised("srcnn", SRCNN(), 32, (24, 24), (24, 24),
                         8436, (36, 50), compute_dtype=dt)
        # EDSR x2: 24 -> 48 patches, batch 16, 4,520 steps/epoch
        bench_supervised("edsr_x2", EDSR(scale_factor=2), 16, (24, 24),
                         (48, 48), 4520, (127, 206), compute_dtype=dt)
        bench_gan(compute_dtype=dt)
        bench_classifier(compute_dtype=dt)


if __name__ == "__main__":
    main()

"""Protocol-scale serving gate: trained weights, bench geometry.

The bench's serving modes (int8 classifier, int8 EDSR, shared-trunk
classifier) all deviate numerically from the f32 per-patch reference path
(VGG16_model.py:168-270 protocol). This harness measures each mode against
that reference AT PROTOCOL SCALE — 512x512 SR images, 96x96 patches,
stride 48, 100-patch majority vote — on REAL trained weights:

1. generates a synthetic 3D-print-surface dataset (smooth background
   vs. periodic ridge "z-offset" stripes — the reference's 2-class task
   shape, preprocessing_functions.ipynb cells 3/6);
2. trains a full-size VGG16 classifier on 96x96 HR patches and an EDSR x4
   on aligned LR/HR crops (real architectures, brief on-device training);
3. runs the six serving configurations over N protocol images and reports
   patch-vote agreement, confidence drift, accuracy, and SR PSNR drift.

Gate standard (VERDICT r2): a serving mode may be a bench default only with
>= 99% vote agreement against the f32 per-patch path and bounded confidence
drift. Results are written to GATE.json at the repo root.

Run:  python -m tpusr.tools.serving_gate --images 256
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

PATCH, STRIDE = 96, 48


# --------------------------------------------------------------- dataset
def make_surface_images(seed: int, n: int, size: int = 512):
    """Synthetic print-surface dataset: class 0 = smooth extrusion, class 1 =
    periodic ridge stripes (z-offset defect look). Returns (hr [n,s,s,3]
    float32 [0,1] numpy, labels [n] int32), balanced and shuffled."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    cells = size // 32 + 1
    bg_small = jax.random.uniform(ks[0], (n, cells, cells, 1), minval=0.3,
                                  maxval=0.7)
    bg = jax.image.resize(bg_small, (n, size, size, 1), "bicubic")
    labels = jnp.arange(n) % 2
    theta = jax.random.uniform(ks[1], (n,), minval=0.0, maxval=np.pi)
    period = jax.random.uniform(ks[2], (n,), minval=16.0, maxval=40.0)
    phase = jax.random.uniform(ks[3], (n,), minval=0.0, maxval=2 * np.pi)
    amp = jax.random.uniform(ks[4], (n,), minval=0.12, maxval=0.25)
    yy, xx = jnp.mgrid[0:size, 0:size]
    proj = (xx[None] * jnp.cos(theta)[:, None, None]
            + yy[None] * jnp.sin(theta)[:, None, None])
    wave = jnp.sin(2 * np.pi * proj / period[:, None, None]
                   + phase[:, None, None])
    stripe = (labels[:, None, None] * amp[:, None, None] * wave)[..., None]
    tint = jnp.asarray([1.0, 0.96, 0.9])
    noise = jax.random.normal(ks[5], (n, size, size, 3)) * 0.02
    img = jnp.clip((bg + stripe) * tint + noise, 0.0, 1.0)
    order = np.random.default_rng(seed).permutation(n)
    return (np.asarray(img, np.float32)[order],
            np.asarray(labels, np.int32)[order])


def _crop_batch(rng, imgs, labels, n, crop):
    idx = rng.integers(0, imgs.shape[0], n)
    y0 = rng.integers(0, imgs.shape[1] - crop + 1, n)
    x0 = rng.integers(0, imgs.shape[2] - crop + 1, n)
    xs = np.stack([imgs[i, a:a + crop, b:b + crop]
                   for i, a, b in zip(idx, y0, x0)])
    return xs, labels[idx]


# --------------------------------------------------------------- training
def train_classifier(hr, labels, steps=600, batch=64, seed=0, verbose=False):
    """Brief on-device training of the full-size VGG16Classifier on 96x96
    HR crops. Returns (params, final_accuracy)."""
    from tpusr.models import VGG16Classifier
    from tpusr.train import ClassifierTrainer

    model = VGG16Classifier(num_classes=2)
    trainer = ClassifierTrainer(model, learning_rate=3e-4)
    state = trainer.init_state(jnp.zeros((1, PATCH, PATCH, 3)))
    rng = np.random.default_rng(seed)
    acc = 0.0
    for step in range(steps):
        xs, ys = _crop_batch(rng, hr, labels, batch, PATCH)
        state, m = trainer.train_step(state, jnp.asarray(xs), jnp.asarray(ys),
                                      step)
        if verbose and (step + 1) % 100 == 0:
            print(f"  clf step {step + 1}: loss={float(m['loss']):.4f} "
                  f"acc={float(m['accuracy']):.3f}")
        acc = float(m["accuracy"])
    return jax.device_get(state.params), acc


def train_edsr(hr, steps=400, batch=16, seed=1, scale=4, verbose=False):
    """Brief training of the full 16-block EDSR x4 on aligned area-downscale
    LR/HR crops (the reference's degradation geometry). Returns params."""
    from tpusr.core.resize import resize
    from tpusr.models import EDSR
    from tpusr.train import SupervisedSRTrainer

    size = hr.shape[1]
    lr_full = np.asarray(resize(jnp.asarray(hr), (size // scale, size // scale),
                                "area"))
    model = EDSR(scale_factor=scale)
    trainer = SupervisedSRTrainer(model, learning_rate=1e-4)
    crop_lr = 32
    state = trainer.init_state(jnp.zeros((1, crop_lr, crop_lr, 3)))
    rng = np.random.default_rng(seed)
    for step in range(steps):
        idx = rng.integers(0, hr.shape[0], batch)
        y0 = rng.integers(0, lr_full.shape[1] - crop_lr + 1, batch)
        x0 = rng.integers(0, lr_full.shape[2] - crop_lr + 1, batch)
        xs = np.stack([lr_full[i, a:a + crop_lr, b:b + crop_lr]
                       for i, a, b in zip(idx, y0, x0)])
        ys = np.stack([hr[i, scale * a:scale * (a + crop_lr),
                          scale * b:scale * (b + crop_lr)]
                       for i, a, b in zip(idx, y0, x0)])
        state, m = trainer.train_step(state, jnp.asarray(xs), jnp.asarray(ys))
        if verbose and (step + 1) % 100 == 0:
            print(f"  edsr step {step + 1}: loss={float(m['loss']):.5f} "
                  f"psnr={float(m['psnr']):.2f}")
    return jax.device_get(state.params)


# ------------------------------------------------------------ vote paths
def _votes_from_probs(probs):
    from tpusr.pipeline.defect_pipeline import _vote
    cls, conf = jax.vmap(_vote)(probs)
    return np.asarray(cls), np.asarray(conf)


def per_patch_votes(clf_probs_fn, sr_images, chunk=8):
    """The reference protocol: reflect-pad, extract every 96/48 patch,
    classify each independently, majority-vote (VGG16_model.py:168-270)."""
    from tpusr.core.pad import pad_amounts
    from tpusr.core.patches import patch_grid_size, patchify

    n, h, w, _ = sr_images.shape
    pad_h, pad_w = pad_amounts(h, w, PATCH, STRIDE)
    nh, nw = patch_grid_size(h + pad_h, w + pad_w, PATCH, STRIDE)

    @jax.jit
    def block_probs(block):
        def per_image(img):
            x = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            return patchify(x, PATCH, STRIDE)

        patches = jax.vmap(per_image)(block)
        flat = patches.reshape((-1,) + patches.shape[2:])
        probs = clf_probs_fn(flat)
        return probs.reshape(block.shape[0], nh * nw, -1)

    cls_all, conf_all = [], []
    for s in range(0, n, chunk):
        block = sr_images[s:s + chunk]
        nb = block.shape[0]
        if nb < chunk:
            block = np.concatenate([block, np.repeat(block[-1:],
                                                     chunk - nb, axis=0)])
        cls, conf = _votes_from_probs(block_probs(jnp.asarray(block)))
        cls_all.append(cls[:nb])
        conf_all.append(conf[:nb])
    return np.concatenate(cls_all), np.concatenate(conf_all)


def shared_trunk_votes(fn, sr_images, chunk=16):
    """fn(block) -> (nb, n_patches, classes) probs (f32 or int8 trunk)."""
    n = sr_images.shape[0]
    jfn = jax.jit(fn)
    cls_all, conf_all = [], []
    for s in range(0, n, chunk):
        block = sr_images[s:s + chunk]
        nb = block.shape[0]
        if nb < chunk:
            block = np.concatenate([block, np.repeat(block[-1:],
                                                     chunk - nb, axis=0)])
        cls, conf = _votes_from_probs(jfn(jnp.asarray(block)))
        cls_all.append(cls[:nb])
        conf_all.append(conf[:nb])
    return np.concatenate(cls_all), np.concatenate(conf_all)


def _apply_sr(fn, r, lr_images, chunk=16):
    from tpusr.models.layers import pixel_shuffle

    jfn = jax.jit(lambda x: pixel_shuffle(fn(x), r))
    out = []
    for s in range(0, lr_images.shape[0], chunk):
        block = lr_images[s:s + chunk]
        nb = block.shape[0]
        if nb < chunk:
            block = np.concatenate([block, np.repeat(block[-1:],
                                                     chunk - nb, axis=0)])
        out.append(np.asarray(jfn(jnp.asarray(block)), np.float32)[:nb])
    return np.concatenate(out)


# ------------------------------------------------------------------ gate
def _compare(name, ref_cls, ref_conf, cls, conf, labels):
    agree = float((cls == ref_cls).mean())
    return {
        "mode": name,
        "vote_agreement": agree,
        "mean_abs_conf_drift": float(np.abs(conf - ref_conf).mean()),
        "max_abs_conf_drift": float(np.abs(conf - ref_conf).max()),
        "accuracy": float((cls == labels).mean()),
    }


def run_gate(n_images=256, size=512, clf_steps=600, edsr_steps=400, seed=0,
             verbose=True):
    """Train at protocol scale, evaluate all serving modes, return the gate
    report dict (also see GATE.json via main())."""
    from tpusr.metrics.image import psnr as psnr_fn
    from tpusr.models import VGG16Classifier
    from tpusr.models.edsr_fast import make_fused_sr_apply
    from tpusr.models.edsr_quant import make_fused_sr_apply_int8
    from tpusr.models.quant import (calibrate_vgg16, quantize_vgg16,
                                    quantized_vgg16_apply)
    from tpusr.models.vgg_trunk import (shared_trunk_probs_f32,
                                        shared_trunk_probs_int8)
    from tpusr.core.resize import resize

    t0 = time.time()
    scale = 4
    lr_hw = size // scale
    n_train = max(64, n_images // 2)

    if verbose:
        print(f"[gate] dataset: {n_train} train + {n_images} eval images "
              f"({size}x{size})")
    hr_train, y_train = make_surface_images(seed, n_train, size)
    hr_eval, y_eval = make_surface_images(seed + 1, n_images, size)

    if verbose:
        print(f"[gate] training VGG16 classifier ({clf_steps} steps)...")
    clf_params, train_acc = train_classifier(hr_train, y_train,
                                             steps=clf_steps, verbose=verbose)
    if verbose:
        print(f"[gate] classifier final train-batch acc: {train_acc:.3f}")
        print(f"[gate] training EDSR x4 ({edsr_steps} steps)...")
    edsr_params = train_edsr(hr_train, steps=edsr_steps, verbose=verbose)

    # protocol LR inputs (area downscale like the degradation model's resize)
    lr_eval = np.asarray(resize(jnp.asarray(hr_eval), (lr_hw, lr_hw), "area"))

    # SR variants
    f32_fn, r = make_fused_sr_apply(edsr_params, scale, dtype=jnp.float32)
    calib_lr = jnp.asarray(lr_eval[:4])
    q_fn, _ = make_fused_sr_apply_int8(edsr_params, scale, sample_lr=calib_lr)
    sr_f32 = _apply_sr(f32_fn, r, lr_eval)
    sr_int8 = _apply_sr(q_fn, r, lr_eval)
    psnr_sr_drift = float(np.mean(np.asarray(
        psnr_fn(jnp.asarray(sr_f32), jnp.asarray(sr_int8)))))

    # classifier variants
    model = VGG16Classifier(num_classes=2)
    calib = _crop_batch(np.random.default_rng(7), hr_train, y_train,
                        32, PATCH)[0]
    qtree = quantize_vgg16(clf_params, calibrate_vgg16(clf_params, calib))
    f32_probs = lambda p: model.apply({"params": clf_params}, p)
    int8_probs = lambda p: quantized_vgg16_apply(qtree, p)

    if verbose:
        print("[gate] A: f32 SR + f32 per-patch (reference path)...")
    ref_cls, ref_conf = per_patch_votes(f32_probs, sr_f32)
    report = {
        "protocol": {"images": n_images, "size": size, "patch": PATCH,
                     "stride": STRIDE,
                     "patches_per_image": 100 if size == 512 else None},
        "training": {"clf_steps": clf_steps, "edsr_steps": edsr_steps,
                     "clf_final_train_acc": train_acc},
        "reference_accuracy": float((ref_cls == y_eval).mean()),
        "psnr_int8_sr_vs_f32_sr_db": psnr_sr_drift,
        "modes": [],
    }

    runs = [
        ("int8_per_patch",
         lambda: per_patch_votes(int8_probs, sr_f32)),
        ("shared_trunk_f32",
         lambda: shared_trunk_votes(
             lambda b: shared_trunk_probs_f32(clf_params, b, PATCH, STRIDE),
             sr_f32)),
        ("shared_trunk_int8",
         lambda: shared_trunk_votes(
             lambda b: shared_trunk_probs_int8(qtree, b, PATCH, STRIDE),
             sr_f32)),
        ("int8_sr_f32_per_patch",
         lambda: per_patch_votes(f32_probs, sr_int8)),
        ("int8_sr_shared_trunk_int8",   # the bench serving configuration
         lambda: shared_trunk_votes(
             lambda b: shared_trunk_probs_int8(qtree, b, PATCH, STRIDE),
             sr_int8)),
    ]
    for name, fn in runs:
        if verbose:
            print(f"[gate] {name}...")
        cls, conf = fn()
        report["modes"].append(_compare(name, ref_cls, ref_conf, cls, conf,
                                        y_eval))

    report["gate_standard"] = {"min_vote_agreement": 0.99}
    report["elapsed_sec"] = round(time.time() - t0, 1)
    for m in report["modes"]:
        m["passes_gate"] = m["vote_agreement"] >= 0.99
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--clf-steps", type=int, default=600)
    ap.add_argument("--edsr-steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="GATE.json")
    args = ap.parse_args(argv)
    report = run_gate(args.images, args.size, args.clf_steps, args.edsr_steps,
                      args.seed)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

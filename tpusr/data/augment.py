"""Keras-ImageDataGenerator-parity stochastic augmentation as jax ops.

Reference recipe (``defect_detection_models/VGG16_model.py:129-140``):
``ImageDataGenerator(rotation_range=20, width_shift_range=.2,
height_shift_range=.2, horizontal_flip=True).flow(...)`` warps every training
batch on the fly, each epoch. Keras implements the warp via
``scipy.ndimage.affine_transform(order=1, mode='nearest')`` on a
rotation-then-shift matrix offset to the ``(h/2+.5, w/2+.5)`` center
(``keras_preprocessing.image.affine_transformations``), then flips
horizontally. This module reproduces that exactly — golden-tested against
``tf.keras.preprocessing.image.apply_affine_transform`` — but as pure
jit/vmap-friendly jnp ops so augmentation runs *inside* the compiled train
step, keyed by the step PRNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_warp(img: jnp.ndarray, theta_deg, tx, ty) -> jnp.ndarray:
    """Warp one HxWxC image exactly like Keras ``apply_affine_transform``.

    ``theta_deg`` rotates; ``tx``/``ty`` shift along rows/cols (pixels —
    Keras's ImageDataGenerator multiplies sub-1 fractions by h/w before
    calling). Sampling is bilinear with edge clamp (= scipy order=1,
    mode='nearest'); scipy's convention maps *output* coords through the
    matrix into the input.
    """
    h, w = img.shape[0], img.shape[1]
    t = jnp.deg2rad(jnp.asarray(theta_deg, jnp.float32))
    ct, st = jnp.cos(t), jnp.sin(t)
    # Keras builds M = R @ Shift, offsets it to the center o=(h/2-.5, w/2-.5)
    # (T_c = O @ M @ O^-1), then permutes the two coordinate axes (PMP) before
    # handing [:2,:2] / [:2,2] to scipy.ndimage.affine_transform, which maps
    # OUTPUT coords through the matrix into the input. Closed form of P@T_c@P:
    m0 = ct * tx - st * ty
    m1 = st * tx + ct * ty
    o0 = h / 2.0 - 0.5
    o1 = w / 2.0 - 0.5
    b0 = o0 - (ct * o0 - st * o1) + m0
    b1 = o1 - (st * o0 + ct * o1) + m1

    rr, cc = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sr = ct * rr + st * cc + b1
    sc = -st * rr + ct * cc + b0
    sr = jnp.clip(sr, 0.0, h - 1.0)
    sc = jnp.clip(sc, 0.0, w - 1.0)
    r0 = jnp.floor(sr)
    c0 = jnp.floor(sc)
    fr = (sr - r0)[..., None]
    fc = (sc - c0)[..., None]
    r0i = r0.astype(jnp.int32)
    c0i = c0.astype(jnp.int32)
    r1i = jnp.minimum(r0i + 1, h - 1)
    c1i = jnp.minimum(c0i + 1, w - 1)
    v00 = img[r0i, c0i]
    v01 = img[r0i, c1i]
    v10 = img[r1i, c0i]
    v11 = img[r1i, c1i]
    top = v00 * (1 - fc) + v01 * fc
    bot = v10 * (1 - fc) + v11 * fc
    return top * (1 - fr) + bot * fr


def random_augment_batch(key, batch: jnp.ndarray, rotation_range: float = 20.0,
                         width_shift_range: float = 0.2,
                         height_shift_range: float = 0.2,
                         horizontal_flip: bool = True) -> jnp.ndarray:
    """Per-image random affine + hflip over an NHWC batch (Keras defaults).

    Parameter distributions match ``ImageDataGenerator.get_random_transform``:
    theta ~ U(-rot, rot) degrees; row/col shifts ~ U(-s, s), scaled by h
    (resp. w) per sample only when |shift| < 1 — Keras treats sub-unit
    draws as fractions of the dimension and larger draws as absolute
    pixels; flip with p=0.5.
    """
    n, h, w = batch.shape[0], batch.shape[1], batch.shape[2]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    theta = jax.random.uniform(k1, (n,), minval=-rotation_range,
                               maxval=rotation_range)
    tx = jax.random.uniform(k2, (n,), minval=-height_shift_range,
                            maxval=height_shift_range)
    tx = jnp.where(jnp.abs(tx) < 1.0, tx * h, tx)
    ty = jax.random.uniform(k3, (n,), minval=-width_shift_range,
                            maxval=width_shift_range)
    ty = jnp.where(jnp.abs(ty) < 1.0, ty * w, ty)
    out = jax.vmap(affine_warp)(batch, theta, tx, ty)
    if horizontal_flip:
        flip = jax.random.bernoulli(k4, 0.5, (n,))
        out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    return out

"""LPIPS (alex) in JAX — the reference EDA's central perceptual metric.

The reference computes LPIPS with the torch ``lpips`` package
(``data/EDA.ipynb cell 1``: ``lpips.LPIPS(net='alex')``), which is not
installed in this environment and whose pretrained weights cannot be
downloaded here (no egress). This is a from-scratch JAX implementation of
the same metric — AlexNet-OWT features, channel-unit-normalized feature
differences, learned per-channel linear weights, spatial mean, layer sum —
consuming an offline-provisioned ``.npz`` weight bundle
(``python -m tpusr.tools.lpips_weights`` converts the official torch
checkpoints; tests validate numerics against a torch re-execution with
identical weights).

Inputs are NHWC RGB in [-1, 1] (the lpips package's convention after its
[0,1] -> [-1,1] normalize).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# channel normalization applied before the feature net (lpips ScalingLayer)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

# AlexNet-OWT .features conv geometry: (kernel, stride, padding, out_ch)
ALEX_CONVS = ((11, 4, 2, 64), (5, 1, 2, 192), (3, 1, 1, 384),
              (3, 1, 1, 256), (3, 1, 1, 256))
# max-pool (3, stride 2) follows conv1 and conv2 taps
_POOL_AFTER = (True, True, False, False, False)


def load_lpips_npz(path: str) -> dict:
    """Load a provisioned LPIPS-alex .npz bundle into jnp arrays."""
    data = np.load(path)
    w = {}
    for i in range(1, 6):
        w[f"conv{i}"] = {"kernel": jnp.asarray(data[f"conv{i}/kernel"]),
                         "bias": jnp.asarray(data[f"conv{i}/bias"])}
        w[f"lin{i}"] = jnp.asarray(data[f"lin{i}/weight"])
    return w


def _alex_feats(w: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """The five ReLU feature taps of AlexNet-OWT .features (NHWC)."""
    feats = []
    for i, ((k, s, p, _c), pool) in enumerate(zip(ALEX_CONVS, _POOL_AFTER),
                                              start=1):
        x = jax.lax.conv_general_dilated(
            x, w[f"conv{i}"]["kernel"], (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + w[f"conv{i}"]["bias"]
        x = jnp.maximum(x, 0.0)
        feats.append(x)
        if pool:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    return feats


def _unit_normalize(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips_alex(w: dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per pair: (N, H, W, 3) [-1,1] RGB x2 -> (N,)."""
    x0 = (img0 - _SHIFT) / _SCALE
    x1 = (img1 - _SHIFT) / _SCALE
    f0s = _alex_feats(w, x0)
    f1s = _alex_feats(w, x1)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(f0s, f1s), start=1):
        d = (_unit_normalize(f0) - _unit_normalize(f1)) ** 2
        lin = w[f"lin{i}"]  # (C,) non-negative learned weights
        total = total + jnp.mean(jnp.sum(d * lin, axis=-1), axis=(1, 2))
    return total


def lpips_alex_from_uint8_rgb(w: dict, a: np.ndarray, b: np.ndarray) -> float:
    """Convenience: two HWC uint8 RGB images -> scalar LPIPS (the EDA's
    per-pair usage, EDA.ipynb cell 5)."""
    x0 = jnp.asarray(a, jnp.float32)[None] / 127.5 - 1.0
    x1 = jnp.asarray(b, jnp.float32)[None] / 127.5 - 1.0
    return float(lpips_alex(w, x0, x1)[0])

"""Epoch time/memory trackers — reference ``deep_learning_models/callbacks.py``.

Same reported fields (`epoch_times_sec`, `gpu_mean_current_mb`, `gpu_peak_mb` —
field names kept so comparison panels port unchanged) but reading JAX device
memory stats instead of tf GPU memory info.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def _device_memory_info(device=None):
    """{'current': bytes, 'peak': bytes} from jax device memory stats, or None."""
    try:
        dev = device or jax.local_devices()[0]
        stats = dev.memory_stats()
        if not stats:
            return None
        return {
            "current": stats.get("bytes_in_use", 0),
            "peak": stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0)),
        }
    except Exception:
        return None


def _mb(b):
    return None if b is None else float(b) / (1024.0 * 1024.0)


class EpochTimeTracker:
    """Wall-clock per epoch (callbacks.py:104-121)."""

    def __init__(self):
        self._t0 = None
        self.epoch_times_sec: list[float] = []

    def begin_epoch(self):
        self._t0 = time.perf_counter()

    def end_epoch(self):
        if self._t0 is None:
            return
        self.epoch_times_sec.append(time.perf_counter() - self._t0)
        self._t0 = None

    def mean_time_value(self) -> float:
        return float(np.mean(self.epoch_times_sec))


class EpochMemoryTracker:
    """Device memory per epoch (callbacks.py:123-175)."""

    def __init__(self, device=None):
        self.device = device
        self.gpu_mean_current_mb: list[float | None] = []
        self.gpu_peak_mb: list[float | None] = []
        self._begin = None

    def begin_epoch(self):
        self._begin = _device_memory_info(self.device)

    def end_epoch(self):
        begin, end = self._begin, _device_memory_info(self.device)
        cur_b = begin.get("current") if isinstance(begin, dict) else None
        cur_e = end.get("current") if isinstance(end, dict) else None
        if cur_b is not None and cur_e is not None:
            self.gpu_mean_current_mb.append(_mb((cur_b + cur_e) / 2.0))
        else:
            self.gpu_mean_current_mb.append(_mb(cur_e) if cur_e is not None else None)
        pk_b = begin.get("peak") if isinstance(begin, dict) else None
        pk_e = end.get("peak") if isinstance(end, dict) else None
        if pk_b is not None and pk_e is not None:
            self.gpu_peak_mb.append(_mb(max(pk_b, pk_e)))
        else:
            self.gpu_peak_mb.append(_mb(pk_e) if pk_e is not None else None)
        self._begin = None

    def as_dict(self):
        cur = [v for v in self.gpu_mean_current_mb if v is not None]
        pk = [v for v in self.gpu_peak_mb if v is not None]
        return {
            "gpu_mean_current_mb": float(np.mean(cur)) if cur else None,
            "gpu_peak_mb": float(np.max(pk)) if pk else None,
        }


class EarlyStopping:
    """monitor='val_loss', restore_best_weights semantics of keras EarlyStopping.

    The best-weight snapshot is a DEVICE-side copy (``jnp.copy`` per leaf),
    taken only on improvement: a host transfer here would cost a full
    params-size device->host copy per improving epoch inside the training
    loop, and storing by reference is unsafe because the jit'd train step
    donates its state (the referenced buffers would be invalidated next
    epoch). ``jnp.copy`` preserves each leaf's sharding, so restore works
    unchanged under a mesh."""

    def __init__(self, patience: int = 3, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = np.inf
        self.best_state = None
        self.wait = 0
        self.stopped_epoch = None

    def update(self, value: float, state) -> bool:
        """Returns True if training should stop."""
        if value < self.best - self.min_delta:
            self.best = value
            self.best_state = jax.tree.map(jnp.copy, state)
            self.wait = 0
            return False
        self.wait += 1
        # keras parity: stop AT the patience-th consecutive non-improving
        # epoch (keras EarlyStopping: `if self.wait >= self.patience`)
        return self.wait >= self.patience


class ReduceLROnPlateau:
    """keras ReduceLROnPlateau semantics: scale LR by `factor` AT the
    patience-th epoch without improvement (`wait >= patience`), improvement
    meaning `value < best - min_delta` (keras default min_delta=1e-4),
    floored at `min_lr`."""

    def __init__(self, factor: float = 0.5, patience: int = 2,
                 min_lr: float = 1e-7, min_delta: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.min_delta = min_delta
        self.best = np.inf
        self.wait = 0

    def update(self, value: float, current_lr: float) -> float:
        if value < self.best - self.min_delta:
            self.best = value
            self.wait = 0
            return current_lr
        self.wait += 1
        if self.wait >= self.patience:
            self.wait = 0
            return max(current_lr * self.factor, self.min_lr)
        return current_lr

"""Checkpointing: orbax params/opt-state save+restore with JSON sidecar metadata.

Replaces the reference's timestamped Keras ``.h5`` saves + pickled metric
sidecars (``SRCNN_model.py:249-259``, ``EDSR_model.py:317-330``,
``ESRGAN_model.py:981-996``) and — unlike the reference — supports true
mid-training resume (optimizer state included).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(directory: str, name: str, tree: Any, metadata: dict | None = None):
    """Save a pytree checkpoint under directory/name (overwrites)."""
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(tree), force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(_jsonable(metadata), f, indent=2)
    return path


class AsyncSaveHandle:
    """Handle for an in-flight async checkpoint save."""

    def __init__(self):
        self._done = threading.Event()
        self._path = None
        self._exc: BaseException | None = None

    def wait(self, timeout: float | None = None) -> str:
        """Block until the save completes; re-raises any writer exception.
        Returns the checkpoint path."""
        if not self._done.wait(timeout):
            raise TimeoutError("async checkpoint save still in flight")
        if self._exc is not None:
            raise self._exc
        return self._path

    def done(self) -> bool:
        return self._done.is_set()


def save_checkpoint_async(directory: str, name: str, tree: Any,
                          metadata: dict | None = None) -> AsyncSaveHandle:
    """Kick off a checkpoint save without blocking the training loop.

    The device->host transfer and the orbax write both happen on a daemon
    thread, overlapped with subsequent train steps. The tree is first
    snapshotted ON DEVICE (``jnp.copy`` per leaf, an O(dispatch) HBM copy):
    jit'd train steps donate their state, so handing the live buffers to a
    background reader would race with their invalidation.

    Call ``handle.wait()`` before relying on the file (e.g. at fit end).
    """
    snap = jax.tree.map(
        lambda a: jnp.copy(a) if isinstance(a, jax.Array) else a, tree)
    handle = AsyncSaveHandle()

    def work():
        try:
            handle._path = save_checkpoint(directory, name, snap, metadata)
        except BaseException as e:  # surfaced at handle.wait()
            handle._exc = e
        finally:
            handle._done.set()

    threading.Thread(target=work, daemon=True).start()
    return handle


def restore_checkpoint(directory: str, name: str, target: Any) -> Any:
    """Restore into the structure of `target` (an abstract or concrete pytree)."""
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(target))
    return ckptr.restore(path, abstract)


def load_metadata(directory: str, name: str) -> dict | None:
    path = os.path.abspath(os.path.join(directory, name)) + ".meta.json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj

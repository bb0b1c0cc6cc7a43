"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference is single-GPU (SURVEY.md §2 parallelism inventory: no
DP/TP/PP/SP/EP, no collectives). The TPU-native design makes data parallelism
first-class and leaves room for model axes:

- a 1-D (or 2-D) ``jax.sharding.Mesh`` with axes ('data',) or ('data','model');
- batches sharded over 'data' via NamedSharding, parameters replicated;
- train steps are plain ``jax.jit`` — XLA inserts the psum for gradients from
  the input shardings, riding ICI within a slice.

All helpers degrade gracefully to a single device.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Build a mesh over the first `n_devices` local devices (default: all)."""
    devs = jax.devices()
    if shape is not None and n_devices is None:
        n_devices = int(np.prod(shape))  # sub-mesh: take only what it needs
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, batch_axis: str = "data", ndim: int = 4) -> NamedSharding:
    """Shard dim 0 over the batch axis, replicate the rest."""
    return NamedSharding(mesh, P(batch_axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, batch_axis: str = "data"):
    """Device-put arrays with dim-0 sharded over the mesh's batch axis."""
    outs = tuple(
        jax.device_put(a, batch_sharding(mesh, batch_axis, np.ndim(a)))
        for a in arrays
    )
    return outs if len(outs) > 1 else outs[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (batch padding for even sharding)."""
    return ((n + m - 1) // m) * m

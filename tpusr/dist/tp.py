"""Tensor parallelism: channel-sharded parameters on a ('data', 'model') mesh.

The reference has no model parallelism (SURVEY §2 parallelism inventory) and
none is required for parity at these sizes (<=20M params) — but the SURVEY
requires the mesh axes be designed so TP can be added; this module adds it
the idiomatic XLA way: annotate parameter shardings on a 2-D mesh and let
the SPMD partitioner insert the collectives (all-gather / reduce-scatter
over ICI). No manual collective calls, no model rewrites — the same flax
``apply``/train-step code runs replicated, DP, or DP x TP depending only on
the shardings of its inputs.

Sharding rule (``tp_spec``): conv kernels (kh, kw, cin, cout) and dense
kernels (cin, cout) shard cout over 'model' when divisible; biases shard
alike. Leaves with indivisible channel counts (e.g. the 3-channel output
conv of an SR net, the num_classes head) stay replicated — XLA stitches the
mixed layout together. Batches shard over 'data' as usual (tpusr.dist.mesh).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(n_data: int, n_model: int) -> Mesh:
    """2-D ('data', 'model') mesh over the first n_data*n_model devices."""
    devs = np.array(jax.devices()[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devs, ("data", "model"))


def tp_spec(path: tuple, leaf, n_model: int, axis: str = "model") -> P:
    """PartitionSpec for one parameter leaf: shard the output-channel dim
    over ``axis`` when divisible, else replicate."""
    shape = np.shape(leaf)
    if len(shape) >= 2 and shape[-1] % n_model == 0:
        return P(*([None] * (len(shape) - 1)), axis)
    if len(shape) == 1 and shape[0] % n_model == 0:
        return P(axis)
    return P()


def shard_params_tp(mesh: Mesh, tree, axis: str = "model"):
    """Device-put a parameter pytree with channel-sharded leaves."""
    n_model = mesh.shape[axis]

    def _put(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, tp_spec(path, leaf, n_model, axis)))

    return jax.tree_util.tree_map_with_path(_put, tree)

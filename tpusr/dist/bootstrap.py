"""Multi-process (multi-host / multi-slice) bootstrap.

Everything else in ``tpusr.dist`` builds meshes over the devices of ONE
process. Real TPU pods and multi-slice deployments run one process per host;
JAX then needs (a) a coordination service so every process sees the GLOBAL
device set, and (b) meshes laid out so that fast ICI carries the
high-bandwidth collectives while the slower DCN (data-center network,
crossing hosts/slices) carries only what it must — in practice: model axes
(tp/pp/sp) inside a slice, pure data-parallel gradient psums across slices.

The reference is single-GPU and has none of this (SURVEY.md §5 communication
backend row: "cross-slice over DCN" is the TPU-native scale-out story).

Usage (one process per host, e.g. under a pod launcher)::

    from tpusr.dist import bootstrap
    bootstrap.initialize()                # env-driven, or pass args
    mesh = bootstrap.global_mesh(("data",))
    # ... identical SPMD program in every process: jit over `mesh`,
    # build global batches with process_local_batch(...)

Certified without TPU hardware by ``tests/test_bootstrap.py``: two CPU
processes (4 virtual devices each) coordinate over a local TCP port, build
an 8-device global mesh, and run a cross-process psum plus a data-parallel
train step whose loss matches the single-process value.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_initialized = False  # our own flag: set after a successful initialize()


def is_initialized() -> bool:
    """True once jax.distributed.initialize has run in this process.

    Checks our module flag first, then falls back to jax's internal state
    (covers the caller having run jax.distributed.initialize directly). The
    internal attribute is private and may move across jax versions, so its
    absence degrades to False rather than raising — initialize() below then
    stays idempotent by catching the 'already initialized' RuntimeError."""
    if _initialized:
        return True
    try:
        state = getattr(jax._src.distributed, "global_state", None)
        return state is not None and state.client is not None
    except Exception:
        return False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Idempotent wrapper over ``jax.distributed.initialize``.

    Arguments fall back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID), and on TPU pods to the metadata
    auto-detection built into JAX (all three None is valid there).

    Returns True if a multi-process runtime is (now) active, False for the
    single-process no-op path — so library code can call this
    unconditionally and keep working in a notebook or unit test.
    """
    if is_initialized():
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    on_tpu_pod = any(v in os.environ for v in
                     ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))
    if coordinator_address is None and not on_tpu_pod:
        if num_processes not in (None, 1):
            raise ValueError("multi-process run needs a coordinator address "
                             "(JAX_COORDINATOR_ADDRESS or argument)")
        return False  # single process: nothing to do

    global _initialized
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    except RuntimeError as e:
        # second-call safety if the private-state probe above ever breaks
        if "already initialized" not in str(e).lower():
            raise
    _initialized = True
    return True


def global_mesh(axis_names: tuple[str, ...] = ("data",),
                shape: tuple[int, ...] | None = None) -> Mesh:
    """Mesh over the GLOBAL device set (all processes).

    Devices are ordered process-major (jax.devices() order), so with
    ``shape=(n_processes * per_host, ...)`` and a leading data axis, each
    process's devices are contiguous along 'data': batch shards stay local
    to the host that loaded them and only the gradient psum crosses DCN.
    """
    devs = jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devs):
        raise ValueError(f"mesh shape {shape} != {len(devs)} global devices")
    return Mesh(np.array(devs).reshape(shape), axis_names)


def hybrid_mesh(dcn_axis: str = "replica", ici_axes: tuple[str, ...] = ("data",),
                ici_shape: tuple[int, ...] | None = None) -> Mesh:
    """DCN x ICI mesh: the leading axis spans processes/slices (DCN), the
    trailing axes span each process's local devices (ICI).

    Shard pure data parallelism over ``dcn_axis`` and everything
    bandwidth-hungry (tp/sp/pp micro-batch traffic) over ``ici_axes`` —
    the scaling-book layout rule: collectives ride ICI, DCN sees only one
    gradient-sized all-reduce per step.
    """
    n_proc = jax.process_count()
    local = len(jax.devices()) // n_proc
    if ici_shape is None:
        ici_shape = (local,) + (1,) * (len(ici_axes) - 1)
    if int(np.prod(ici_shape)) != local:
        raise ValueError(f"ici shape {ici_shape} != {local} devices/process")
    devs = np.array(jax.devices()).reshape((n_proc,) + tuple(ici_shape))
    return Mesh(devs, (dcn_axis,) + tuple(ici_axes))


def process_local_batch(mesh: Mesh, array: np.ndarray,
                        batch_axis: str = "data"):
    """Build a GLOBAL batch from this process's LOCAL shard.

    Every process passes its own ``array`` (the examples it loaded); the
    result is one logical jax.Array of global shape
    (n_processes * local_n, ...) sharded over ``batch_axis`` — the
    multi-host analog of ``tpusr.dist.shard_batch``. No data crosses DCN
    here; each device keeps the rows its own process provided.
    """
    sharding = NamedSharding(mesh, P(batch_axis,
                                     *([None] * (np.ndim(array) - 1))))
    return jax.make_array_from_process_local_data(sharding, array)

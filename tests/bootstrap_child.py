"""Child process for the multi-host bootstrap certification test.

Launched twice by tests/test_bootstrap.py (process_id 0 and 1), each with 4
virtual CPU devices. Coordinates over a local TCP port, builds the global
8-device mesh, and writes a JSON result file with:
  - a cross-process collective result (sum over a batch only this process
    half-provided — forces a DCN-analog reduce), and
  - the loss of one data-parallel train step on a tiny EDSR, for the parent
    to compare against the single-process value.

Run: python bootstrap_child.py <process_id> <num_processes> <port> <outfile>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # before any device query

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    pid, nproc, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tpusr.dist import bootstrap

    assert not bootstrap.is_initialized()
    active = bootstrap.initialize(f"localhost:{port}", nproc, pid)
    assert active and bootstrap.is_initialized()
    assert jax.process_count() == nproc
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == nproc * 4

    mesh = bootstrap.global_mesh(("data",))

    # 1. cross-process collective: each process contributes DIFFERENT local
    # rows; the replicated jnp.sum output can only be right if the reduce
    # crossed the process boundary.
    local = np.full((4, 2), float(pid + 1), np.float32)
    gbatch = bootstrap.process_local_batch(mesh, local)
    assert gbatch.shape == (nproc * 4, 2)
    total = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(
        gbatch))

    # 2. DP train step == single-process: same deterministic init + data as
    # the parent's reference computation.
    from tpusr.models import EDSR
    from tpusr.train import SupervisedSRTrainer

    model = EDSR(scale_factor=2, num_res_blocks=1, num_filters=8)
    trainer = SupervisedSRTrainer(model, learning_rate=1e-3)
    state = trainer.init_state(jnp.zeros((1, 8, 8, 3)))
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a), rep), state)

    rng = np.random.default_rng(7)
    xs = rng.random((8, 8, 8, 3), dtype=np.float32)
    ys = rng.random((8, 16, 16, 3), dtype=np.float32)
    lo, hi = pid * 4, (pid + 1) * 4
    xs_g = bootstrap.process_local_batch(mesh, xs[lo:hi])
    ys_g = bootstrap.process_local_batch(mesh, ys[lo:hi])
    state, metrics = trainer.train_step(state, xs_g, ys_g)
    loss = float(metrics["loss"])

    # hybrid DCN x ICI mesh shape sanity
    hmesh = bootstrap.hybrid_mesh("replica", ("data",))
    assert hmesh.devices.shape == (nproc, 4)

    with open(outfile, "w") as f:
        json.dump({"pid": pid, "psum_total": total, "dp_loss": loss}, f)


if __name__ == "__main__":
    main()

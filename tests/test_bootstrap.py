"""Multi-host bootstrap certification: two REAL processes (4 virtual CPU
devices each) coordinate via jax.distributed, build an 8-device global mesh,
and must agree with single-process numerics (SURVEY.md §5 communication
backend row — the cross-host/DCN story).

The single-process reference runs in THIS process (the conftest's 8-device
CPU runtime); the children run tests/bootstrap_child.py.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # two child processes x jax import + compile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "bootstrap_child.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _reference_dp_loss():
    """Single-process value of the child's train step (same init, same data,
    full 8-row batch)."""
    from tpusr.models import EDSR
    from tpusr.train import SupervisedSRTrainer

    model = EDSR(scale_factor=2, num_res_blocks=1, num_filters=8)
    trainer = SupervisedSRTrainer(model, learning_rate=1e-3)
    state = trainer.init_state(jnp.zeros((1, 8, 8, 3)))
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.random((8, 8, 8, 3), dtype=np.float32))
    ys = jnp.asarray(rng.random((8, 16, 16, 3), dtype=np.float32))
    _, metrics = trainer.train_step(state, xs, ys)
    return float(metrics["loss"])


def test_two_process_mesh_psum_and_dp_step(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"child{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, CHILD, str(pid), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("bootstrap child timed out")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"child failed:\n{log}"

    results = [json.loads(o.read_text()) for o in outs]
    # collective: 4 rows x 2 cols of 1.0 from pid 0 + of 2.0 from pid 1
    for r in results:
        assert r["psum_total"] == pytest.approx(8 * 1.0 + 8 * 2.0)
    # both processes saw the SAME replicated loss, and it matches the
    # single-process step on the full batch
    assert results[0]["dp_loss"] == pytest.approx(results[1]["dp_loss"],
                                                  rel=1e-6)
    assert results[0]["dp_loss"] == pytest.approx(_reference_dp_loss(),
                                                  rel=1e-4)


def test_single_process_initialize_is_noop(monkeypatch):
    from tpusr.dist import bootstrap

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert bootstrap.initialize() is False  # no coordinator -> no-op
    with pytest.raises(ValueError):
        bootstrap.initialize(num_processes=2)  # multi-proc needs an address


def test_global_mesh_single_process_matches_local():
    from tpusr.dist import bootstrap

    mesh = bootstrap.global_mesh(("data", "model"), shape=(4, 2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        bootstrap.global_mesh(("data",), shape=(3,))

"""Auxiliary subsystems: metrics logger, debug mode, remat training parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpusr.train.logging import MetricsLogger, read_jsonl, jsonl_to_csv
from tpusr.utils import debug_mode, assert_all_finite


def test_metrics_logger_roundtrip(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(path, run_name="t") as log:
        log.log_step(0, {"loss": 1.5, "psnr": jnp.asarray(30.0)})
        log.log_step(1, {"loss": 1.2, "psnr": 31.0})
        log.log_epoch(0, {"val_loss": 1.1})
    steps = read_jsonl(path, scope="step")
    assert len(steps) == 2
    assert steps[1]["psnr"] == 31.0
    assert read_jsonl(path, scope="epoch")[0]["val_loss"] == 1.1
    jsonl_to_csv(path, str(tmp_path / "metrics.csv"), scope="step")
    assert (tmp_path / "metrics.csv").read_text().count("\n") == 3


def test_debug_mode_catches_nan():
    with pytest.raises(FloatingPointError):
        with debug_mode(nans=True):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # config restored
    assert not jax.config.jax_debug_nans


def test_assert_all_finite():
    assert_all_finite({"a": jnp.ones((3,))})
    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": {"b": jnp.asarray([1.0, np.nan])}}, "params")


def test_remat_training_matches_plain():
    from tpusr.models import SRCNN
    from tpusr.train import SupervisedSRTrainer

    rng = np.random.default_rng(0)
    y = rng.random((8, 12, 12, 3), dtype=np.float32)
    x = np.roll(y, 1, axis=1)

    plain = SupervisedSRTrainer(SRCNN(f1=8, f2=4), learning_rate=1e-3)
    remat = SupervisedSRTrainer(SRCNN(f1=8, f2=4), learning_rate=1e-3, remat=True)
    s1 = plain.init_state(x[:1])
    s2 = remat.init_state(x[:1])
    s1, m1 = plain.train_step(s1, jnp.asarray(x), jnp.asarray(y))
    s2, m2 = remat.train_step(s2, jnp.asarray(x), jnp.asarray(y))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-7
    for a, b in zip(jax.tree.leaves(jax.device_get(s1.params)),
                    jax.tree.leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_time_compiled_and_memory():
    from tpusr.train.profiling import time_compiled, device_memory_mb
    f = jax.jit(lambda x: x * 2.0)
    dt = time_compiled(f, jnp.ones((64, 64)), iters=3)
    assert dt > 0
    mem = device_memory_mb()
    assert "current_mb" in mem and "peak_mb" in mem

"""Micro-batching server tests: coalescing, padding, parity with direct calls."""

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models import EDSR, VGG16Classifier
from tpusr.pipeline import FusedSRClassifyPipeline
from tpusr.pipeline.serving import PipelineServer


def _make_pipeline():
    sr_model = EDSR(scale_factor=2, num_res_blocks=1)
    sv = sr_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    clf_model = VGG16Classifier(num_classes=2)
    cv = clf_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    return FusedSRClassifyPipeline(
        sr_apply=lambda x: sr_model.apply(sv, x),
        clf_apply=lambda p: clf_model.apply(cv, p),
        lr_hw=(16, 16), scale=2, patch=32, stride=16)


def test_server_matches_direct_calls():
    pipe = _make_pipeline()
    rng = np.random.default_rng(0)
    imgs = rng.random((7, 16, 16, 3)).astype(np.float32)  # odd count -> padding
    direct_sr, direct_cls, direct_conf = pipe(imgs[:7])

    with PipelineServer(pipe, batch_size=4, max_wait_ms=50) as server:
        futs = [server.submit(img) for img in imgs]
        results = [f.result(timeout=120) for f in futs]

    for i, r in enumerate(results):
        assert r["class"] == int(direct_cls[i])
        assert abs(r["confidence"] - float(direct_conf[i])) < 1e-5
        np.testing.assert_allclose(r["sr"], np.asarray(direct_sr[i]), atol=1e-5)


def test_server_error_propagation():
    def broken(_):
        raise RuntimeError("boom")

    with PipelineServer(broken, batch_size=2, max_wait_ms=5) as server:
        fut = server.submit(np.zeros((16, 16, 3), np.float32))
        try:
            fut.result(timeout=30)
            raised = False
        except RuntimeError:
            raised = True
        assert raised


def test_server_mismatched_shape_fails_batch_not_worker():
    """A bad-shape request must fail its batch's futures; the worker keeps
    serving later requests (regression: np.stack outside the try killed the
    worker thread and hung every subsequent request)."""
    import pytest

    pipe = _make_pipeline()
    rng = np.random.default_rng(1)
    good = rng.random((16, 16, 3)).astype(np.float32)
    bad = rng.random((8, 8, 3)).astype(np.float32)

    with PipelineServer(pipe, batch_size=2, max_wait_ms=30) as server:
        f1 = server.submit(good)
        f2 = server.submit(bad)  # co-batched: stack fails for both
        with pytest.raises(Exception):
            f1.result(timeout=60)
        with pytest.raises(Exception):
            f2.result(timeout=60)
        # worker survived: a fresh request still resolves
        r = server.classify(good, timeout=120)
        assert r["class"] in (0, 1)


def test_server_stop_fails_pending_and_rejects_submit():
    import queue as _q

    import pytest

    pipe = _make_pipeline()
    server = PipelineServer(pipe, batch_size=2, max_wait_ms=5)
    # never started: queued futures must still be failed on stop, not left
    # pending until the caller's timeout
    fut = server.submit(np.zeros((16, 16, 3), np.float32))
    server.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        fut.result(timeout=5)
    with pytest.raises(RuntimeError, match="stopped"):
        server.submit(np.zeros((16, 16, 3), np.float32))


def test_server_cancelled_future_does_not_poison_batch():
    pipe = _make_pipeline()
    rng = np.random.default_rng(2)
    imgs = rng.random((2, 16, 16, 3)).astype(np.float32)
    direct_cls = np.asarray(pipe(imgs)[1])

    server = PipelineServer(pipe, batch_size=2, max_wait_ms=500)
    # cancel one request BEFORE starting the worker, so it is still queued
    f1 = server.submit(imgs[0])
    f2 = server.submit(imgs[1])
    assert f1.cancel()
    server.start()
    r2 = f2.result(timeout=120)
    assert r2["class"] == int(direct_cls[1])
    server.stop()

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

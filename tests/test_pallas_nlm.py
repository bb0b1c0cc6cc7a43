"""Pallas NLM kernel vs the jnp scan formulation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tpusr.classic.algorithms import nl_means_denoise
from tpusr.core.pallas_nlm import nlm_denoise_pallas


def test_pallas_nlm_matches_scan():
    rng = np.random.default_rng(0)
    img = np.clip(0.5 + rng.normal(0, 0.08, (40, 48)).astype(np.float32), 0, 1)
    sigma = 0.08
    h = 1.15 * sigma
    want = np.asarray(nl_means_denoise(jnp.asarray(img), sigma, h))
    got = np.asarray(nlm_denoise_pallas(jnp.asarray(img), sigma, h,
                                        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

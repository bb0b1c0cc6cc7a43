"""Benchmark: end-to-end 4x SR + defect classification at 128x128 LR.

The BASELINE.json north-star config: LR batch -> EDSR x4 (16 res blocks,
64 filters — the reference's full architecture) -> VGG16 patch-vote defect
classification (96x96 patches, stride 48 — the reference's protocol), all as
one jit'd graph on a single TPU chip. Steady-state images/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 500 img/s/chip north-star target.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_TARGET_IPS = 500.0  # BASELINE.json: >=500 images/sec/chip


def main():
    import jax
    import jax.numpy as jnp

    from tpusr.models import EDSR, VGG16Classifier
    from tpusr.pipeline.defect_pipeline import FusedSRClassifyPipeline

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    lr_hw = (128, 128)
    scale = 4
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" else jnp.float32

    sr_model = EDSR(scale_factor=scale)
    clf_model = VGG16Classifier(num_classes=2)
    sv = sr_model.init(jax.random.PRNGKey(0), jnp.zeros((1, *lr_hw, 3), jnp.float32))
    cv = clf_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 96, 96, 3), jnp.float32))

    # bf16 params + activations for the MXU; outputs cast back to f32.
    sv_c = jax.tree.map(lambda a: a.astype(dtype), sv)
    cv_c = jax.tree.map(lambda a: a.astype(dtype), cv)

    def sr_apply(x):
        return sr_model.apply(sv_c, x.astype(dtype))

    def clf_apply(p):
        return clf_model.apply(cv_c, p.astype(dtype)).astype(jnp.float32)

    pipe = FusedSRClassifyPipeline(sr_apply, clf_apply, lr_hw, scale,
                                   patch=96, stride=48)

    lr_batch = jnp.asarray(
        np.random.default_rng(0).random((batch, *lr_hw, 3), dtype=np.float32))

    # warm-up / compile
    out = pipe._run(lr_batch)
    jax.block_until_ready(out)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipe._run(lr_batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    print(json.dumps({
        "metric": "images_per_sec_per_chip_e2e_4x_sr_classify_128",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_TARGET_IPS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())

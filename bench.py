"""Benchmark: end-to-end 4x SR + defect classification at 128x128 LR.

The BASELINE.json north-star config: LR batch -> EDSR x4 (16 res blocks,
64 filters — the reference's full architecture) -> VGG16 patch-vote defect
classification (96x96 patches, stride 48 — the reference's protocol), all as
one jit'd graph on a single TPU chip.

Methodology: the timed region is a `fori_loop` chain of N_CHAIN pipeline
iterations INSIDE one jit, each iteration's input derived from the previous
SR output — so every iteration does real, data-dependent device work and
host/tunnel round-trip latency is amortized out. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline"}; vs_baseline is against the
500 img/s/chip north-star target.

Precision: the default serving configuration runs the SR net in bf16 and the
classifier backbone in post-training int8 (tpusr.models.quant — v5e's int8 MXU
path, patch-vote decisions track f32 to >=90% on random weights and tighter on
trained ones). Set BENCH_INT8=0 for the bf16-classifier configuration and
BENCH_BF16=0 for full f32 (the fp32 logit-parity path, also covered by
tests/test_keras_import.py).
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
    from tpusr.models.edsr_fast import make_fused_sr_apply
    from tpusr.models.layers import pixel_shuffle
    from tpusr.core.pad import pad_amounts
    from tpusr.core.patches import patchify, patch_grid_size
    from tpusr.pipeline.defect_pipeline import _vote

    use_int8 = os.environ.get("BENCH_INT8", "1") == "1"
    # int8 EDSR (PTQ, mixed-precision trunk): 1.57x on the body convs
    # (PERF.md round 3); rides the same serving-gate standard as the
    # classifier int8 path. BENCH_SR_INT8=0 keeps the bf16 SR stage.
    use_sr_int8 = os.environ.get("BENCH_SR_INT8", "1" if use_int8 else "0") == "1"
    # Shared-trunk classifier: ONE full-image VGG16 trunk + pool-aligned
    # patch GAP extraction instead of 100 per-patch forwards (~2.9x fewer
    # MACs; tpusr/models/vgg_trunk.py). Same vote protocol; conv borders see
    # real context instead of per-patch zero pad — serving default since the
    # protocol-scale gate passed (GATE.json: 100% vote agreement on trained
    # weights at 512x512/96/48; tpusr.tools.serving_gate).
    use_shared_trunk = (os.environ.get("BENCH_SHARED_TRUNK", "1") == "1"
                        and use_int8)
    # bf16/f32 classifier patches are 4x the int8 ones: batch 128 needs
    # ~28 G HBM of the chip's 15.75 G, so the non-int8 paths default lower
    batch = int(os.environ.get("BENCH_BATCH", "128" if use_int8 else "64"))
    n_chain = int(os.environ.get("BENCH_CHAIN", "3"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    lr_hw = (128, 128)
    scale = 4
    patch, stride = 96, 48
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16", "1") == "1" else jnp.float32

    sr_model = EDSR(scale_factor=scale)
    clf_model = VGG16Classifier(num_classes=2)
    sv = jax.tree.map(lambda a: a.astype(dtype),
                      sr_model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, *lr_hw, 3), jnp.float32)))
    cv_full = clf_model.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, patch, patch, 3), jnp.float32))
    if use_int8:
        from tpusr.models.quant import (calibrate_vgg16, quantize_vgg16,
                                        quantized_vgg16_apply, quantize_input)
        calib = np.random.default_rng(2).random((16, patch, patch, 3),
                                                dtype=np.float32)
        qtree = quantize_vgg16(cv_full["params"],
                               calibrate_vgg16(cv_full["params"], calib))
        # quantize BEFORE patchify: the patch tensor (the pipeline's largest
        # intermediate) shrinks 4x
        pre_quant = lambda sr: quantize_input(qtree, sr)
        clf_apply = lambda p: quantized_vgg16_apply(qtree, p)
    else:
        cv = jax.tree.map(lambda a: a.astype(dtype), cv_full)
        pre_quant = lambda sr: sr.astype(dtype)
        clf_apply = lambda p: clf_model.apply(cv, p.astype(dtype)).astype(jnp.float32)

    hr = lr_hw[0] * scale
    pad_h, pad_w = pad_amounts(hr, hr, patch, stride)
    nh, nw = patch_grid_size(hr + pad_h, hr + pad_w, patch, stride)

    # fused linear tail: EDSR's upsample tail (up convs + pixel shuffles +
    # final conv) has no nonlinearities, so it collapses into ONE composed
    # conv in polyphase space (5.6x fewer tail FLOPs, zero shuffle-relayout
    # copies; exact incl. borders — tests/test_edsr_fast.py). The interleave
    # runs after int8 quantization (3-channel, ~50x fewer bytes).
    if use_sr_int8:
        from tpusr.models.edsr_quant import make_fused_sr_apply_int8
        calib_lr = jnp.asarray(np.random.default_rng(3).random(
            (4, *lr_hw, 3), dtype=np.float32))
        # border_correction=False is the serving default: gated in
        # GATE.json (100% vote agreement, conf drift unchanged); the
        # chained-tail border band costs ~14.5 ms/iter. BENCH_SR_BORDER=1
        # restores the exact EDSR.apply border semantics.
        sr_fused, r_last = make_fused_sr_apply_int8(
            sv["params"], scale, sample_lr=calib_lr,
            border_correction=os.environ.get("BENCH_SR_BORDER", "0") == "1")
    else:
        sr_fused, r_last = make_fused_sr_apply(sv["params"], scale, dtype=dtype)

    def one_iter(x):
        sr_p = sr_fused(x)                  # (N, 128, 128, scale^2*3), [0,1]
        srq_p = pre_quant(sr_p)
        srq = pixel_shuffle(srq_p, r_last)  # int8 interleave: 3 channels

        if use_shared_trunk:
            from tpusr.models.vgg_trunk import shared_trunk_probs_int8
            probs = shared_trunk_probs_int8(qtree, srq, patch, stride)
        else:
            def per_image(img):
                padded = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)),
                                 mode="reflect")
                return patchify(padded, patch, stride)

            patches = jax.vmap(per_image)(srq)
            flat = patches.reshape((-1,) + patches.shape[2:])
            probs = clf_apply(flat).astype(jnp.float32)
            probs = probs.reshape(sr_p.shape[0], nh * nw, -1)
        classes, confs = jax.vmap(_vote)(probs)
        # data-dependent feedback: next LR derives from this SR + vote result;
        # sr[::scale, ::scale] == polyphase phase (0, 0) channels
        nxt = (sr_p[..., :3].astype(jnp.float32)
               + confs[:, None, None, None] * 1e-6)
        return nxt

    chain = jax.jit(lambda x: jax.lax.fori_loop(
        0, n_chain, lambda i, z: one_iter(z), x))

    lr_batch = jnp.asarray(
        np.random.default_rng(0).random((batch, *lr_hw, 3), dtype=np.float32))

    # hard sync: on the axon tunnel, block_until_ready can return before the
    # TPU finishes (observed: chained train steps "measured" 30x past peak
    # FLOPs); a one-element device->host transfer is an unambiguous barrier.
    hard_sync = lambda a: np.asarray(a[0, 0, 0, 0])

    out = chain(lr_batch)           # warm-up / compile
    hard_sync(out)

    t0 = time.perf_counter()
    for _ in range(reps):
        out = chain(out)
    hard_sync(out)
    dt = time.perf_counter() - t0
    ips = batch * n_chain * reps / dt

    print(json.dumps({
        "metric": "images_per_sec_per_chip_e2e_4x_sr_classify_128",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_TARGET_IPS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())

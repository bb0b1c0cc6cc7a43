"""Benchmark: end-to-end 4x SR + defect classification at 128x128 LR.

The BASELINE.json north-star config: LR batch -> EDSR x4 (16 res blocks,
64 filters — the reference's full architecture) -> VGG16 patch-vote defect
classification (96x96 patches, stride 48 — the reference's protocol), all as
one jit'd graph on a single TPU chip.

Methodology: the timed region is a `fori_loop` chain of N_CHAIN pipeline
iterations INSIDE one jit, each iteration's input derived from the previous
SR output — so every iteration does real, data-dependent device work and
host/tunnel round-trip latency is amortized out (measured ~7.7 ms per
dispatch; <0.1% at the default chain depth 32). The loop bound is passed
as a traced scalar, not a Python constant: a constant bound lets XLA
unroll the chain, making compile time scale with depth.

Output: ONE JSON line {"metric", "value", "unit", "vs_baseline", "frontier"}.
`value` is the default serving mode's throughput; `frontier` carries the full
fidelity-throughput frontier measured in the same run — every serving mode
from the protocol-scale gate (tpusr.tools.serving_gate / GATE.json) plus the
bf16 and f32 parity paths, each annotated with its fidelity class. The
north-star's "bitwise-comparable" reading is the f32_parity row; the gated
modes trade bounded, measured fidelity drift for throughput (see PERF.md
roofline: a per-patch f32 path above ~345 img/s exceeds single-chip peak
bf16 FLOPs, so >=500 img/s REQUIRES the algorithmic modes).

Env knobs: BENCH_FRONTIER=0 measures only the default mode (fast smoke);
BENCH_MODE=<name> overrides the default mode; BENCH_BATCH, BENCH_CHAIN,
BENCH_REPS as before. The default mode is measured FIRST and BENCH_BUDGET_S
(default 3000) bounds the whole run: when the budget runs out, remaining
frontier rows are emitted as {"skipped": true} instead of risking the
driver's timeout on 12 cold compiles — the headline number always lands.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_TARGET_IPS = 500.0  # BASELINE.json: >=500 images/sec/chip

# mode name -> (sr precision, border band, classifier path, fidelity class)
MODES = {
    # gated fast modes (protocol-scale vote-agreement gate: GATE.json)
    "int8_sr_noborder_shared_trunk_int8": dict(
        sr="int8", border=False, clf="shared_trunk_int8",
        fidelity="classify-only: SR image not faithful (no border band; "
                 "PSNR vs f32 SR below the 35 dB bound — GATE.json)"),
    "int8_sr_shared_trunk_int8": dict(
        sr="int8", border=True, clf="shared_trunk_int8",
        fidelity="gated votes; SR image PSNR vs f32 SR recorded in GATE.json"),
    "int8_sr_per_patch_int8": dict(
        sr="int8", border=True, clf="per_patch_int8",
        fidelity="gated votes; reference patch protocol, int8 numerics"),
    # hard-gate certified (GATE_r05.json, 6 seeds x 128 images): exact f32
    # SR image + int8 per-patch classifier — ZERO vote flips on every seed
    "int8_per_patch": dict(
        sr="f32", border=True, clf="per_patch_int8",
        fidelity="hard-gate certified: f32 SR (image-faithful by "
                 "construction), int8 per-patch votes, 0 flips on all 6 "
                 "GATE_r05.json hard-task seeds"),
    # conf-ranked cascade rows (the round-4 default candidates): DEMOTED by
    # the round-5 fresh seeds — trunk confidence mis-ranks flips on 4 of 6
    # seeds (GATE_r05.json: conf rows fail the 99% bar at EVERY measured
    # fraction up to 0.5; the calibration assumption behind frac=0.25 was
    # refuted out-of-sample). Kept as measured frontier rows only.
    "cascade_int8": dict(
        sr="f32", border=True, clf="cascade_int8", frac=0.625,
        fidelity="DEMOTED (GATE_r05.json): conf-ranked escalation misses "
                 "flips the trunk is confident about on 4 of 6 seeds; use "
                 "the vote_frac rows"),
    "cascade_int8_calibrated": dict(
        sr="f32", border=True, clf="cascade_int8", frac=0.25,
        fidelity="DEMOTED (GATE_r05.json): the per-deployment calibration "
                 "assumption was refuted on fresh seeds (conf ranking needs "
                 "up to frac 0.86 for zero flips)"),
    # vote_frac-ranked cascade (cascade.py escalate_score='vote_frac'):
    # patch-disagreement ranking. The UNGUARDED cascade passed 6 seeds but
    # the round-5 seed extension found a fresh draw (seed 8) whose full-
    # image trunk COLLAPSES — unanimous, high-confidence, high-agreement
    # wrong votes that no escalation ranking can catch (agreement 0.62).
    # The guard (cascade.py guard_threshold=0.6) detects collapse from the
    # escalated subset's trunk-vs-per-patch disagreement (healthy <=0.44,
    # collapsed 1.00) and falls back to full per-patch — the guarded rows
    # are the only cascades passing all TWELVE GATE_r05.json seeds
    # (seeds 9-11 are fully out-of-sample: frac, ranking AND guard threshold
    # were chosen before those runs existed).
    "cascade_int8_votefrac": dict(
        sr="f32", border=True, clf="cascade_int8", frac=0.25,
        score="vote_frac",
        fidelity="DEMOTED by the round-5 seed extension (GATE_r05.json "
                 "seed 8: trunk collapse, agreement 0.62 — no ranking can "
                 "escalate it); use cascade_int8_votefrac_guarded"),
    "cascade_int8_votefrac_guarded": dict(
        sr="f32", border=True, clf="cascade_int8", frac=0.25,
        score="vote_frac", guard=0.6,
        fidelity="hard-gate certified on ALL TWELVE GATE_r05.json hard-task "
                 "seeds (1536 images, min 99.22% vote agreement, 4 flips; "
                 "pre-registered >=99% bar, no calibration assumed): "
                 "cascade_int8[vote_frac+guard]@frac=0.25 — the trunk-"
                 "collapse guard catches the seed-8 failure the unguarded "
                 "rows miss; f32 SR (image-faithful by construction)"),
    "cascade_int8_votefrac_strict": dict(
        sr="f32", border=True, clf="cascade_int8", frac=0.3125,
        score="vote_frac", guard=0.6,
        fidelity="strictest cascade tier: 1 flip in 1536 images across all "
                 "12 seeds (cascade_int8[vote_frac+guard]@frac=0.3125); a "
                 "zero-flip tier no longer exists — seed 6's single "
                 "escalation-target flip (int8_per_patch, 99.22%) is "
                 "irreducible for every int8 mode"),
    # bf16-SR rows: DEMOTED by the seed extension. bf16 SR stays image-
    # faithful (35.6-35.8 dB vs f32 SR on all 12 seeds) but its boundary-
    # vote drift costs 2 flips on seed 6's per-patch target (98.44% < the
    # 99% bar) — and a cascade cannot beat its own escalation target.
    # Measured frontier rows only; they certified on the first 6 seeds
    # (min 99.22%) and are the right choice under a >=98.4% bar.
    "cascade_bf16sr_votefrac": dict(
        sr="bf16", border=True, clf="cascade_int8", frac=0.28125,
        score="vote_frac", guard=0.6,
        fidelity="DEMOTED at the 99% bar by the round-5 seed extension "
                 "(GATE_r05.json seed 6: the bf16-SR per-patch escalation "
                 "target itself has 2 boundary flips, 98.44%); certified "
                 "min 98.44% / mean 99.61% over 12 seeds, bf16 SR image-"
                 "faithful at 35.6-35.8 dB vs f32 SR"),
    "bf16": dict(
        sr="bf16", border=True, clf="per_patch_bf16",
        fidelity="bf16 numerics, exact protocol and graph"),
    "f32_parity": dict(
        sr="f32", border=True, clf="per_patch_f32",
        fidelity="bitwise reference-comparable path "
                 "(logit parity: tests/test_keras_import.py)"),
}
# Default = the fastest mode that passes the pre-registered hard-task gate
# (>= 99% vote agreement vs the f32 per-patch reference path) on EVERY seed
# of GATE_r05.json — TWELVE seeds x 128 images, 9 of them selection-fresh
# (3 of those fully out-of-sample, run after frac/ranking/guard were all
# frozen) —
# AND whose SR output is image-faithful. That is the GUARDED f32-SR
# vote_frac cascade at frac=0.25 (min 99.22%, 4 flips / 1536 images, no
# calibration assumption). The round-5 seed extension demoted the two
# previous default candidates honestly: the unguarded cascade dies on a
# fresh seed whose trunk collapses (seed 8, agreement 0.62), and every
# bf16-SR mode dies on a fresh seed where bf16 boundary drift costs 2
# flips in its own escalation target (seed 6, 98.44% — so the 500.5 img/s
# bf16 default certified on 6 seeds did NOT survive 9; it remains the
# fastest >=98.4%-certified image-faithful row). The shared-trunk /
# int8-SR / conf-ranked modes fail the hard gate and are frontier rows
# only (accuracy is preserved on their flips: the reference vote itself is
# a near-coin-flip there, but the gate bar is vote agreement, not
# accuracy). tests/test_gate_consistency.py pins this default to the
# shipped artifact.
DEFAULT_MODE = "cascade_int8_votefrac_guarded"


def build_chain(mode_cfg, sr_params, clf_params_f32, lr_hw, scale, patch,
                stride, n_chain):
    """Compile one serving mode's chained pipeline; returns (fn, batch_size).

    int8 modes run batch 128; the f32/bf16 patch tensors are 4x larger, so
    those paths run batch 64 (the 128-batch patch tensor alone would exceed
    the chip's 15.75G HBM).
    """
    import jax
    import jax.numpy as jnp

    from tpusr.core.pad import pad_amounts
    from tpusr.core.patches import patchify, patch_grid_size
    from tpusr.models import VGG16Classifier
    from tpusr.models.edsr_fast import make_fused_sr_apply
    from tpusr.models.layers import pixel_shuffle
    from tpusr.pipeline.defect_pipeline import _vote

    int8_clf = mode_cfg["clf"].endswith("int8")
    batch = int(os.environ.get("BENCH_BATCH", "128" if int8_clf else "64"))
    clf_model = VGG16Classifier(num_classes=2)

    qtree = None
    if int8_clf:
        from tpusr.models.quant import (calibrate_vgg16, quantize_vgg16,
                                        quantize_input, quantized_vgg16_apply)
        calib = np.random.default_rng(2).random((16, patch, patch, 3),
                                                dtype=np.float32)
        qtree = quantize_vgg16(clf_params_f32,
                               calibrate_vgg16(clf_params_f32, calib))
        # quantize BEFORE patchify: the patch tensor (the pipeline's largest
        # intermediate) shrinks 4x
        pre_quant = lambda sr: quantize_input(qtree, sr)
        clf_apply = lambda p: quantized_vgg16_apply(qtree, p)
    else:
        dtype = jnp.bfloat16 if mode_cfg["clf"].endswith("bf16") else jnp.float32
        cv = jax.tree.map(lambda a: a.astype(dtype), clf_params_f32)
        pre_quant = lambda sr: sr.astype(dtype)
        clf_apply = lambda p: clf_model.apply(
            {"params": cv}, p.astype(dtype)).astype(jnp.float32)

    hr = lr_hw[0] * scale
    pad_h, pad_w = pad_amounts(hr, hr, patch, stride)
    nh, nw = patch_grid_size(hr + pad_h, hr + pad_w, patch, stride)

    # fused linear tail: EDSR's upsample tail (up convs + pixel shuffles +
    # final conv) has no nonlinearities, so it collapses into ONE composed
    # conv in polyphase space (5.6x fewer tail FLOPs, zero shuffle-relayout
    # copies; exact incl. borders — tests/test_edsr_fast.py). The interleave
    # runs after quantization (3-channel, far fewer bytes).
    if mode_cfg["sr"] == "int8":
        from tpusr.models.edsr_quant import make_fused_sr_apply_int8
        calib_lr = jnp.asarray(np.random.default_rng(3).random(
            (4, *lr_hw, 3), dtype=np.float32))
        sr_fused, r_last = make_fused_sr_apply_int8(
            sr_params, scale, sample_lr=calib_lr,
            border_correction=mode_cfg["border"])
    else:
        dt = jnp.bfloat16 if mode_cfg["sr"] == "bf16" else jnp.float32
        sp = jax.tree.map(lambda a: a.astype(dt), sr_params)
        sr_fused, r_last = make_fused_sr_apply(sp, scale, dtype=dt)

    use_shared = mode_cfg["clf"].startswith("shared_trunk")
    use_cascade = mode_cfg["clf"] == "cascade_int8"
    if use_cascade:
        from tpusr.pipeline.cascade import make_cascade_votes
        frac = float(os.environ.get("BENCH_CASCADE_FRAC",
                                    str(mode_cfg["frac"])))
        score = os.environ.get("BENCH_CASCADE_SCORE",
                               mode_cfg.get("score", "conf"))
        cascade_votes = make_cascade_votes(
            qtree, patch, stride, escalate_frac=frac,
            escalate_score=score,
            guard_threshold=mode_cfg.get("guard"))

    def one_iter(x):
        sr_p = sr_fused(x)                  # (N, 128, 128, scale^2*3), [0,1]
        srq_p = pre_quant(sr_p)
        srq = pixel_shuffle(srq_p, r_last)  # int8 interleave: 3 channels

        if use_cascade:
            classes, confs = cascade_votes(srq)
            nxt = (sr_p[..., :3].astype(jnp.float32)
                   + confs[:, None, None, None] * 1e-6)
            return nxt
        if use_shared:
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

    # the chain bound is a TRACED scalar, not a Python constant: a constant
    # trip count lets XLA fully unroll the loop, so compile time scales with
    # BENCH_CHAIN (chain=16 was >13 min; the while-loop lowering compiles the
    # body once at any depth and its per-iteration condition check is noise
    # against the ~250 ms body)
    jitted = jax.jit(lambda x, n: jax.lax.fori_loop(
        0, n, lambda i, z: one_iter(z), x))
    chain = lambda x: jitted(x, jnp.int32(n_chain))
    return chain, batch


def measure(chain, batch, lr_hw, n_chain, reps):
    import jax.numpy as jnp

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
    return batch * n_chain * reps / dt


def main():
    import jax

    # opt-in persistent compile cache (same knob as tests/conftest.py):
    # the 7-mode frontier is compile-dominated on a cold run
    _cache_dir = os.environ.get("TPUSR_COMPILE_CACHE")
    if _cache_dir:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tpusr.models import EDSR, VGG16Classifier

    default_mode = os.environ.get("BENCH_MODE", DEFAULT_MODE)
    if default_mode not in MODES:
        raise SystemExit(f"BENCH_MODE={default_mode!r} unknown; "
                         f"choose from {sorted(MODES)}")
    frontier_on = os.environ.get("BENCH_FRONTIER", "1") == "1"
    # 32 iterations per call amortize the per-call host/tunnel overhead
    # (~7.7 ms measured by a chain-depth sweep) to <0.1% of the ~250 ms
    # iteration; the traced loop bound keeps compile time depth-independent
    n_chain = int(os.environ.get("BENCH_CHAIN", "32"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    lr_hw = (128, 128)
    scale = 4
    patch, stride = 96, 48

    sr_model = EDSR(scale_factor=scale)
    clf_model = VGG16Classifier(num_classes=2)
    sv = sr_model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, *lr_hw, 3), jnp.float32))["params"]
    cv = clf_model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, patch, patch, 3), jnp.float32))["params"]

    mode_names = list(MODES) if frontier_on else [default_mode]
    # headline first: if the time budget dies mid-frontier, the default
    # mode's number is already in hand
    mode_names.sort(key=lambda n: n != default_mode)
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "3000"))
    t_start = time.perf_counter()
    frontier, value = [], None
    for name in mode_names:
        if name != default_mode and time.perf_counter() - t_start > budget_s:
            frontier.append({"mode": name, "skipped": True,
                             "fidelity": MODES[name]["fidelity"]})
            print(f"# {name}: skipped (BENCH_BUDGET_S={budget_s:.0f} spent)",
                  file=sys.stderr, flush=True)
            continue
        chain, batch = build_chain(MODES[name], sv, cv, lr_hw, scale, patch,
                                   stride, n_chain)
        ips = measure(chain, batch, lr_hw, n_chain, reps)
        row = {"mode": name, "images_per_sec": round(ips, 2), "batch": batch,
               "fidelity": MODES[name]["fidelity"],
               "vs_baseline": round(ips / BASELINE_TARGET_IPS, 4)}
        frontier.append(row)
        if name == default_mode:
            value = ips
        print(f"# {name}: {ips:.2f} img/s", file=sys.stderr, flush=True)
        del chain
        jax.clear_caches()  # 7 modes x big graphs: don't stack executables

    print(json.dumps({
        "metric": "images_per_sec_per_chip_e2e_4x_sr_classify_128",
        "value": round(value, 2),
        "unit": "images/sec",
        "vs_baseline": round(value / BASELINE_TARGET_IPS, 4),
        "default_mode": default_mode,
        "frontier": frontier,
    }))


if __name__ == "__main__":
    sys.exit(main())

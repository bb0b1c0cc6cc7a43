"""SR-emitter probe (round 4): does widening the channel dim rescue the
int8 conv emitter at the EDSR body's shapes?

The round-3 roofline left one soft spot: the SR stage runs at 39% of int8
peak e2e (isolated body 51%) while the VGG trunk hits 61%. Hypothesis: the
body's 64-channel convs half-fill the MXU's 128-lane output tile, and a
merged res-block pair presenting 128-lane shapes would recover it.

Every semantics-preserving widening of y = x + s*W2*relu(W1*x) doubles the
MACs (the identity-carry construction: conv1' = [W1; delta] 64->128, then
conv2' = [s*W2, delta] 128->64 with a half-masked relu — exact, 2x work).
So the break-even is measurable WITHOUT building the merged model: if the
int8 emitter's per-useful-MAC efficiency at 128-deep/128-wide shapes is
less than 2x its 64-channel efficiency, every widening scheme loses.

This probe measures that curve directly at the SR stage's spatial geometry
(batch 128 @ 128x128 LR = the bench serving shape), then prices the merged
block. Mosaic/XLA DCE hygiene per PERF.md round 2: chained iterations with
data-dependent feedback inside one jit, hard host-transfer sync.

Run on the chip: python bench_emitter.py
"""

import json
import sys
import time

import numpy as np

V5E_INT8_TOPS = 394e12  # per-chip int8 peak


def main():
    import jax
    import jax.numpy as jnp

    N, H, W = 128, 128, 128
    n_chain, reps = 8, 3

    def conv_case(cin, cout):
        """Chained int8 3x3 convs cin->cout->cin... with bf16 glue (the
        edsr_quant pattern: int8 conv, f32 accum, requant)."""
        k1 = jnp.asarray(np.random.default_rng(0).integers(
            -127, 127, (3, 3, cin, cout), dtype=np.int8))
        k2 = jnp.asarray(np.random.default_rng(1).integers(
            -127, 127, (3, 3, cout, cin), dtype=np.int8))

        def body(i, x):
            a = jax.lax.conv_general_dilated(
                x, k1, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            a8 = jnp.clip(a >> 8, -128, 127).astype(jnp.int8)
            b = jax.lax.conv_general_dilated(
                a8, k2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            # data-dependent feedback defeats loop-invariant hoisting
            return jnp.clip((b >> 8) + i, -128, 127).astype(jnp.int8)

        fn = jax.jit(lambda x: jax.lax.fori_loop(0, n_chain, body, x))
        x0 = jnp.asarray(np.random.default_rng(2).integers(
            -128, 127, (N, H, W, cin), dtype=np.int8))
        out = fn(x0)
        np.asarray(out[0, 0, 0, 0])  # hard sync (compile + warm)
        t0 = time.perf_counter()
        o = out
        for _ in range(reps):
            o = fn(o)
        np.asarray(o[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        iters = n_chain * reps
        macs = 2 * N * H * W * 9 * cin * cout * iters  # two convs per iter
        eff = (2 * macs) / dt / V5E_INT8_TOPS          # ops = 2*MACs
        return dt / iters * 1e3, eff

    rows = []
    for cin, cout, label in ((64, 64, "body 64->64 (current EDSR block)"),
                             (32, 32, "32-lane"),
                             (128, 128, "128-lane (merged-block target)"),
                             (256, 256, "256-lane"),
                             (64, 128, "widening conv1' 64->128"),
                             (128, 64, "narrowing conv2' 128->64")):
        ms, eff = conv_case(cin, cout)
        rows.append({"shape": f"{cin}->{cout}", "label": label,
                     "ms_per_conv_pair": round(ms, 3),
                     "emitter_efficiency": round(eff, 4)})
        print(f"# {label}: {ms:.3f} ms/pair, {eff:.1%} of int8 peak",
              file=sys.stderr, flush=True)

    base = next(r for r in rows if r["shape"] == "64->64")
    # The identity-carry merged block executes EXACTLY a (64->128, 128->64)
    # conv pair — the "64->128" case measures that pair directly (k1 widens,
    # k2 narrows back). It wins only if that pair is FASTER than the
    # current (64->64, 64->64) pair despite doing 2x the MACs.
    merged = next(r for r in rows if r["shape"] == "64->128")
    native128 = next(r for r in rows if r["shape"] == "128->128")
    verdict = {
        "merged_pair_ms": merged["ms_per_conv_pair"],
        "current_pair_ms": base["ms_per_conv_pair"],
        "merged_slowdown": round(merged["ms_per_conv_pair"]
                                 / base["ms_per_conv_pair"], 3),
        "merged_block_wins": (merged["ms_per_conv_pair"]
                              < base["ms_per_conv_pair"]),
        # context: what a NATIVE 128-channel body (different architecture,
        # not semantics-preserving) would get from the emitter
        "native_128ch_efficiency_ratio": round(
            native128["emitter_efficiency"] / base["emitter_efficiency"], 3),
    }
    print(json.dumps({"metric": "int8_conv_emitter_efficiency_curve",
                      "geometry": {"batch": N, "hw": [H, W],
                                   "chain": n_chain, "reps": reps},
                      "rows": rows, "merged_block_verdict": verdict}))


if __name__ == "__main__":
    main()

"""Confidence-cascade serving mode: shared-trunk votes + exact escalation.

The shared-trunk classifier (tpusr.models.vgg_trunk) is ~2.9x fewer MACs
than the reference per-patch protocol (VGG16_model.py:168-270) but differs
from it by the per-patch SAME-conv zero-padding delta; at the hard gate
operating point (GATE_r05.json, reference accuracy ~0.95) that drift flips
votes on genuinely-near-boundary images and the trunk alone misses the
pre-registered >=99% vote-agreement bar. The per-patch int8 path
(`int8_per_patch`) is hard-gate certified with ZERO flips, but costs ~2.9x
the trunk's MACs on every image.

The cascade takes both: classify every image with the shared trunk, then
re-classify the K LEAST-CONFIDENT images of the batch with the certified
per-patch path and serve those exact votes instead. Escalated images carry
certified votes by construction, so the cascade's only failure channel is a
flipped image that the trunk was *confident* about — exactly what the gate
measures: `tpusr.tools.serving_gate` derives the cascade analytically from
both parents' per-image votes at every threshold in CASCADE_THRESHOLDS and
reports `unescalated_flips` plus the per-seed escalation fraction, so the
static K here can be chosen with measured headroom (GATE_r05.json).

Measured finding (GATE_r05.json, 6 hard-task seeds — 3 selection-fresh):
trunk CONFIDENCE is not a reliable escalation ranking — on 4 of 6 seeds
the trunk is confident about images it flips (conf-ranked rows fail the
99% bar at every fraction up to 0.5; the round-4 "calibrate per
deployment" assumption was refuted out-of-sample). Patch-agreement
ranking (``escalate_score='vote_frac'``) IS reliable for ordinary
boundary drift: the conv-padding delta that flips a vote first shows up
as patch disagreement, so flips rank low by construction.

Second measured finding (round-5 seed extension, seeds 6-8): on one fresh
weight/dataset draw (seed 8) the full-image trunk COLLAPSED — unanimous,
high-confidence, high-patch-agreement votes for one class while the
per-patch reference splits 81/47. No escalation score can rank such flips
(they look maximally healthy), so every unguarded cascade fails that seed
catastrophically (agreement 0.62-0.68). The fix is the ``guard``: the
escalated subset already carries BOTH the trunk's and the per-patch path's
votes, so their disagreement fraction is a free estimator of the trunk's
batch flip rate. Healthy seeds measure 0.03-0.44 at K=32; the collapsed
seed measures 1.00 — a guard at ``guard_threshold=0.6`` separates them
with wide margin and triggers a full-batch per-patch fallback
(``lax.cond``: the fallback branch only executes when triggered). A
spurious trigger is correctness-safe (per-patch IS the certified path; it
only costs throughput), so the threshold errs low. The guarded
vote_frac cascade at frac=0.25 passes the pre-registered >=99% bar on ALL
NINE seeds (min 99.22%, worst seeds leave exactly 1 flip in 128).

TPU-native shape discipline: K is static (top_k + gather + scatter inside
one jit graph — no data-dependent shapes) and the guard is a scalar
``lax.cond``, so the whole cascade fuses into the serving pipeline's
single compiled step.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tpusr.core.pad import pad_amounts
from tpusr.core.patches import patch_grid_size, patchify
from tpusr.models.quant import quantize_input, quantized_vgg16_apply
from tpusr.models.vgg_trunk import shared_trunk_probs_int8


def make_cascade_votes(qtree: dict, patch: int = 96, stride: int = 48,
                       escalate_frac: float = 0.25,
                       escalate_score: str = "conf",
                       guard_threshold: float | None = None):
    """Build the cascade vote function for a quantized VGG16 tree.

    Returns ``votes(images, n_valid=None) -> (classes, confidences)`` —
    jittable, static shapes. ``images``: (N, H, W, 3) [0,1] f32 or
    pre-quantized int8 from ``quantize_input``. Per trace,
    ``K = max(1, ceil(N * escalate_frac))`` lowest-trunk-score images are
    re-classified with the exact per-patch int8 path (the GATE-certified
    mode); the rest keep their shared-trunk votes. Escalating a confident
    image is harmless (it can only receive the certified vote), so K needs
    only to EXCEED the gate's measured below-threshold fraction, not match
    it. ceil (not round) so a served batch can never escalate a SMALLER
    fraction than certified: at the certified frac=0.28125 and batch 16,
    round(4.5) would bankers-round DOWN to 4 = frac 0.25 — below the
    certified minimum; ceil gives 5. At the gate's own N=128 every
    CASCADE_FRACS value is an exact multiple of 1/128, so ceil == round
    there and certified fractions transfer unchanged.

    ``n_valid`` (traced int scalar, default all-N) marks rows >= n_valid as
    batch padding: their scores are forced to +inf so they can NEVER consume
    an escalation slot. PipelineServer pads partial batches by repeating the
    last real image — without the mask, duplicate low-score pad rows would
    displace genuinely low-confidence real images from the top-K and
    silently shrink the certified escalation coverage over REAL images. With
    the mask, K >= ceil(n_valid * escalate_frac) real images always
    escalate (escalating leftover pad rows when K > n_valid is harmless).

    ``escalate_score`` ranks the batch for escalation:
      'conf'       — `_vote`'s mean winning-class probability (round-4
                     default before the rank analysis);
      'vote_frac'  — fraction of patches agreeing with the final vote,
                     conf as an exact lexicographic tie-break. Patch
                     DISAGREEMENT is the direct signal of the conv-padding
                     drift that flips votes; the gate's
                     `cascade_rank_analysis` measures which score ranks
                     real flips lower per seed (GATE_r05.json).

    ``guard_threshold`` (None = off) arms the trunk-collapse guard: if the
    fraction of ESCALATED images whose exact per-patch vote disagrees with
    their trunk vote reaches the threshold, the whole batch is re-served
    from the per-patch path (``lax.cond`` — the fallback only executes when
    triggered, so the healthy-path cost is one scalar compare). This is the
    only defense against the measured seed-8 failure mode where the trunk
    collapses with HIGH confidence and HIGH patch agreement (see module
    docstring); 0.6 sits in the wide measured gap between healthy (<=0.44)
    and collapsed (1.00) canary readings. When ``n_valid`` marks pad rows,
    escalated pad rows are duplicates of a real image, so their
    disagreement mirrors a real image's — the canary stays meaningful.
    """
    if not 0.0 < escalate_frac <= 1.0:
        raise ValueError(f"escalate_frac must be in (0, 1], got "
                         f"{escalate_frac}")
    if escalate_score not in ("conf", "vote_frac"):
        raise ValueError(f"escalate_score must be 'conf' or 'vote_frac', "
                         f"got {escalate_score!r}")
    from tpusr.pipeline.defect_pipeline import _vote

    def votes(images: jnp.ndarray, n_valid=None):
        if images.dtype != jnp.int8:
            images = quantize_input(qtree, images)
        n, h, w, _ = images.shape
        pad_h, pad_w = pad_amounts(h, w, patch, stride)
        nh, nw = patch_grid_size(h + pad_h, w + pad_w, patch, stride)

        probs_t = shared_trunk_probs_int8(qtree, images, patch, stride)
        cls_t, conf_t = jax.vmap(_vote)(probs_t)
        if escalate_score == "vote_frac":
            preds = jnp.argmax(probs_t, axis=-1)          # (N, n_patches)
            agree = (preds == cls_t[:, None]).astype(jnp.float32)
            # conf <= 1 scaled by half a 1/n_patches quantum: exactly
            # lexicographic (vote_frac, conf) — mirrors the gate's
            # _lex_score so certified fracs transfer
            score = agree.mean(axis=1) + conf_t * (0.5 / (nh * nw))
        else:
            score = conf_t
        if n_valid is not None:  # pad rows must never win escalation slots
            score = jnp.where(jnp.arange(n) < n_valid, score, jnp.inf)

        k = max(1, min(n, math.ceil(n * escalate_frac - 1e-9)))
        _, idx = jax.lax.top_k(-score, k)       # k lowest-scored images
        sel = jnp.take(images, idx, axis=0)

        def per_image(img):
            x = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
            return patchify(x, patch, stride)

        patches = jax.vmap(per_image)(sel)
        flat = patches.reshape((-1,) + patches.shape[2:])
        probs_p = quantized_vgg16_apply(qtree, flat).reshape(k, nh * nw, -1)
        cls_p, conf_p = jax.vmap(_vote)(probs_p)
        merged = (cls_t.at[idx].set(cls_p), conf_t.at[idx].set(conf_p))
        if guard_threshold is None:
            return merged

        # trunk-collapse guard: the escalated subset carries both vote sets,
        # so their disagreement estimates the trunk's batch flip rate for
        # free; past the threshold, serve the WHOLE batch from the certified
        # per-patch path (only executes when triggered)
        def full_per_patch(_):
            p = jax.vmap(per_image)(images)
            f = p.reshape((-1,) + p.shape[2:])
            pr = quantized_vgg16_apply(qtree, f).reshape(n, nh * nw, -1)
            return jax.vmap(_vote)(pr)

        canary = (cls_p != jnp.take(cls_t, idx)).mean()
        return jax.lax.cond(canary >= guard_threshold,
                            full_per_patch, lambda _: merged, None)

    return votes

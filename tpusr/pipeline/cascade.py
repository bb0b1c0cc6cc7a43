"""Confidence-cascade serving mode: shared-trunk votes + exact escalation.

The shared-trunk classifier (tpusr.models.vgg_trunk) is ~2.9x fewer MACs
than the reference per-patch protocol (VGG16_model.py:168-270) but differs
from it by the per-patch SAME-conv zero-padding delta; at the hard gate
operating point (GATE_r04.json, reference accuracy ~0.95) that drift flips
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
static K here can be chosen with measured headroom (GATE_r04.json).

TPU-native shape discipline: K is static (top_k + gather + scatter inside
one jit graph — no data-dependent shapes), so the whole cascade fuses into
the serving pipeline's single compiled step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusr.core.pad import pad_amounts
from tpusr.core.patches import patch_grid_size, patchify
from tpusr.models.quant import quantize_input, quantized_vgg16_apply
from tpusr.models.vgg_trunk import shared_trunk_probs_int8


def make_cascade_votes(qtree: dict, patch: int = 96, stride: int = 48,
                       escalate_frac: float = 0.25):
    """Build the cascade vote function for a quantized VGG16 tree.

    Returns ``votes(images) -> (classes, confidences)`` — jittable, static
    shapes. ``images``: (N, H, W, 3) [0,1] f32 or pre-quantized int8 from
    ``quantize_input``. Per trace, ``K = max(1, round(N * escalate_frac))``
    lowest-trunk-confidence images are re-classified with the exact
    per-patch int8 path (the GATE_r04-certified mode); the rest keep their
    shared-trunk votes. Escalating a confident image is harmless (it can
    only receive the certified vote), so K needs only to EXCEED the gate's
    measured below-threshold fraction, not match it.
    """
    if not 0.0 < escalate_frac <= 1.0:
        raise ValueError(f"escalate_frac must be in (0, 1], got "
                         f"{escalate_frac}")
    from tpusr.pipeline.defect_pipeline import _vote

    def votes(images: jnp.ndarray):
        if images.dtype != jnp.int8:
            images = quantize_input(qtree, images)
        n, h, w, _ = images.shape
        pad_h, pad_w = pad_amounts(h, w, patch, stride)
        nh, nw = patch_grid_size(h + pad_h, w + pad_w, patch, stride)

        probs_t = shared_trunk_probs_int8(qtree, images, patch, stride)
        cls_t, conf_t = jax.vmap(_vote)(probs_t)

        k = max(1, min(n, round(n * escalate_frac)))
        _, idx = jax.lax.top_k(-conf_t, k)      # k least-confident images
        sel = jnp.take(images, idx, axis=0)

        def per_image(img):
            x = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)),
                        mode="reflect")
            return patchify(x, patch, stride)

        patches = jax.vmap(per_image)(sel)
        flat = patches.reshape((-1,) + patches.shape[2:])
        probs_p = quantized_vgg16_apply(qtree, flat).reshape(k, nh * nw, -1)
        cls_p, conf_p = jax.vmap(_vote)(probs_p)
        return cls_t.at[idx].set(cls_p), conf_t.at[idx].set(conf_p)

    return votes

"""Protocol-scale serving gate: trained weights, bench geometry.

The bench's serving modes (int8 classifier, int8 EDSR, shared-trunk
classifier) all deviate numerically from the f32 per-patch reference path
(VGG16_model.py:168-270 protocol). This harness measures each mode against
that reference AT PROTOCOL SCALE — 512x512 SR images, 96x96 patches,
stride 48, 100-patch majority vote — on REAL trained weights:

1. generates a synthetic 3D-print-surface dataset (smooth background
   vs. periodic ridge "z-offset" stripes — the reference's 2-class task
   shape, preprocessing_functions.ipynb cells 3/6);
2. trains a full-size VGG16 classifier on 96x96 HR crops and an EDSR x4
   on aligned LR/HR crops (real architectures, brief on-device training);
3. runs the seven serving configurations over N protocol images and reports
   patch-vote agreement, confidence drift, accuracy, and SR PSNR/SSIM drift
   (an SR-modifying mode is "image_faithful" only >= 35 dB vs f32 SR).

Everything — dataset, crop pools, SR outputs, patch probabilities — stays
DEVICE-RESIDENT; only scalars and (N,)-vectors cross the host boundary.
(The dev tunnel moves bulk data at <1 MB/s; a host-side version of this
harness spends most of an hour in transfers.)

Gate standard (VERDICT r2): a serving mode may be a bench default only with
>= 99% vote agreement against the f32 per-patch path and bounded confidence
drift. Results are written to GATE.json at the repo root.

Run:  python -m tpusr.tools.serving_gate --images 128
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

PATCH, STRIDE = 96, 48


# --------------------------------------------------------------- dataset
def make_surface_images(seed: int, n: int, size: int = 512,
                        amp_range=(0.12, 0.25), noise: float = 0.01,
                        coverage_range=(1.0, 1.0)):
    """Synthetic print-surface dataset: class 0 = smooth extrusion, class 1 =
    periodic ridge stripes (z-offset defect look). Returns DEVICE arrays
    (hr [n,s,s,3] float32 [0,1], labels [n] int32), balanced and shuffled.

    ``coverage_range`` is the task-DIFFICULTY lever: each defect image's
    stripes cover only a random fraction of the surface (a half-plane band —
    the way a real z-offset error affects the layers printed during one
    period). Patch-level discrimination stays easy (striped patches look
    like the full-coverage task), but the IMAGE-level majority vote of a
    low-coverage defect image is genuinely near the 50% boundary — so the
    trained f32 reference path lands below 1.0 accuracy with real
    near-0.5-confidence votes, matching the reference's ~0.92 operating
    point (VGG16.ipynb cell 8). (Amplitude/noise were measured NOT to be a
    usable lever: the stripe competes with same-frequency background
    texture, so amp below ~0.12 makes training collapse outright rather
    than degrade gracefully.) Defaults keep the original full-coverage
    round-3 task."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 9)
    cells = size // 32 + 1

    @jax.jit
    def build():
        bg_small = jax.random.uniform(ks[0], (n, cells, cells, 1), minval=0.3,
                                      maxval=0.7)
        bg = jax.image.resize(bg_small, (n, size, size, 1), "bicubic")
        labels = jnp.arange(n) % 2
        theta = jax.random.uniform(ks[1], (n,), minval=0.0, maxval=np.pi)
        period = jax.random.uniform(ks[2], (n,), minval=32.0, maxval=64.0)
        phase = jax.random.uniform(ks[3], (n,), minval=0.0, maxval=2 * np.pi)
        amp = jax.random.uniform(ks[4], (n,), minval=amp_range[0],
                                 maxval=amp_range[1])
        yy, xx = jnp.mgrid[0:size, 0:size]
        proj = (xx[None] * jnp.cos(theta)[:, None, None]
                + yy[None] * jnp.sin(theta)[:, None, None])
        wave = jnp.sin(2 * np.pi * proj / period[:, None, None]
                       + phase[:, None, None])
        stripe = (labels[:, None, None] * amp[:, None, None] * wave)[..., None]
        # partial-coverage band: stripes only where the projection onto a
        # second random direction falls below the per-image coverage cut
        cov = jax.random.uniform(ks[7], (n,), minval=coverage_range[0],
                                 maxval=coverage_range[1])
        phi = jax.random.uniform(ks[8], (n,), minval=0.0, maxval=np.pi)
        band = (xx[None] * jnp.cos(phi)[:, None, None]
                + yy[None] * jnp.sin(phi)[:, None, None])
        bmin = band.min(axis=(1, 2), keepdims=True)
        bmax = band.max(axis=(1, 2), keepdims=True)
        u = (band - bmin) / (bmax - bmin)
        stripe = stripe * (u <= cov[:, None, None])[..., None]
        tint = jnp.asarray([1.0, 0.96, 0.9])
        nz = jax.random.normal(ks[5], (n, size, size, 3)) * noise
        img = jnp.clip((bg + stripe) * tint + nz, 0.0, 1.0)
        order = jax.random.permutation(ks[6], n)
        return jnp.take(img, order, axis=0), jnp.take(labels, order, axis=0)

    img, labels = build()
    return img, labels.astype(jnp.int32)


def surface_labels(seed: int, n: int) -> np.ndarray:
    """The labels `make_surface_images(seed, n, ...)` returns, WITHOUT
    building the images — the label vector depends only on the seed's key
    split (labels = arange(n) % 2 permuted by ks[6]), so offline tools
    (gate_rederive) can recover the eval labels of a stored gate run.
    Key math mirrors make_surface_images exactly; gate_rederive additionally
    cross-checks recomputed accuracies against every stored mode row."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    labels = jnp.arange(n) % 2
    order = jax.random.permutation(ks[6], n)
    return np.asarray(jnp.take(labels, order, axis=0).astype(jnp.int32))


def make_crop_pool(seed: int, imgs: jnp.ndarray, labels: jnp.ndarray, k: int,
                   crop: int, align: int = 1):
    """k random crops as a device-resident pool: (crops, labels, offsets).
    ``align`` keeps offsets divisible (for scale-aligned LR/HR pairs)."""
    n, h, w, _ = imgs.shape
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (k,), 0, n)
    y0 = jax.random.randint(k2, (k,), 0, (h - crop) // align + 1) * align
    x0 = jax.random.randint(k3, (k,), 0, (w - crop) // align + 1) * align

    @jax.jit
    def gather():
        def get(i, a, b):
            img = jax.lax.dynamic_index_in_dim(imgs, i, 0, keepdims=False)
            return jax.lax.dynamic_slice(img, (a, b, 0), (crop, crop, 3))

        return jax.vmap(get)(idx, y0, x0)

    return gather(), jnp.take(labels, idx), (idx, y0, x0)


# --------------------------------------------------------------- training
def train_classifier(hr, labels, steps=500, batch=64, seed=0, verbose=False):
    """Brief on-device training of the full-size VGG16Classifier on 96x96
    crops from a device-resident pool. Returns (params, final_accuracy)."""
    from tpusr.models import VGG16Classifier
    from tpusr.train import ClassifierTrainer

    from tpusr.core.resize import resize

    pool_x, pool_y, _ = make_crop_pool(seed + 100, hr, labels, 2048, PATCH)
    # augment half the pool with a downscale->upscale cycle so the trained
    # classifier is robust on SR-reconstructed surfaces (the serving domain)
    half = pool_x.shape[0] // 2
    cycled = resize(resize(pool_x[:half], (PATCH // 4, PATCH // 4), "area"),
                    (PATCH, PATCH), "bicubic")
    pool_x = jnp.concatenate([jnp.clip(cycled, 0.0, 1.0), pool_x[half:]])
    # pool_y unchanged: the cycle degrades pixels, not labels
    model = VGG16Classifier(num_classes=2)
    trainer = ClassifierTrainer(model, learning_rate=2e-4)
    state = trainer.init_state(jnp.zeros((1, PATCH, PATCH, 3)))
    key = jax.random.PRNGKey(seed)
    acc = None
    for step in range(steps):
        idx = jax.random.randint(jax.random.fold_in(key, step), (batch,), 0,
                                 pool_x.shape[0])
        xs = jnp.take(pool_x, idx, axis=0)      # device-side gather
        ys = jnp.take(pool_y, idx, axis=0)
        state, m = trainer.train_step(state, xs, ys, step)
        if verbose and (step + 1) % 100 == 0:
            print(f"  clf step {step + 1}: loss={float(m['loss']):.4f} "
                  f"acc={float(m['accuracy']):.3f}", flush=True)
        acc = m["accuracy"]
    return state.params, float(acc)


def train_edsr(hr, steps=300, batch=16, seed=1, scale=4, verbose=False):
    """Brief training of the full 16-block EDSR x4 on aligned area-downscale
    LR/HR crops (the reference's degradation geometry), all device-resident.
    Returns params."""
    from tpusr.core.resize import resize
    from tpusr.models import EDSR
    from tpusr.train import SupervisedSRTrainer

    size = hr.shape[1]
    crop_hr = 128
    pool_hr, _, (idx, y0, x0) = make_crop_pool(seed + 200, hr, hr[:, 0, 0, 0],
                                               1024, crop_hr, align=scale)
    pool_lr = resize(pool_hr, (crop_hr // scale, crop_hr // scale), "area")
    model = EDSR(scale_factor=scale)
    trainer = SupervisedSRTrainer(model, learning_rate=1e-4)
    state = trainer.init_state(jnp.zeros((1, crop_hr // scale,
                                          crop_hr // scale, 3)))
    key = jax.random.PRNGKey(seed)
    for step in range(steps):
        sel = jax.random.randint(jax.random.fold_in(key, step), (batch,), 0,
                                 pool_hr.shape[0])
        xs = jnp.take(pool_lr, sel, axis=0)
        ys = jnp.take(pool_hr, sel, axis=0)
        state, m = trainer.train_step(state, xs, ys)
        if verbose and (step + 1) % 100 == 0:
            print(f"  edsr step {step + 1}: loss={float(m['loss']):.5f} "
                  f"psnr={float(m['psnr']):.2f}", flush=True)
    return state.params


# ------------------------------------------------------------ vote paths
def per_patch_votes(clf_probs_fn, sr_images: jnp.ndarray, chunk=8):
    """The reference protocol: reflect-pad, extract every 96/48 patch,
    classify each independently, majority-vote (VGG16_model.py:168-270).
    ``sr_images`` stays on device; chunks are device-side slices."""
    from tpusr.core.pad import pad_amounts
    from tpusr.core.patches import patch_grid_size, patchify

    n, h, w, _ = sr_images.shape
    pad_h, pad_w = pad_amounts(h, w, PATCH, STRIDE)
    nh, nw = patch_grid_size(h + pad_h, w + pad_w, PATCH, STRIDE)

    @jax.jit
    def block_votes(block):
        def per_image(img):
            x = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            return patchify(x, PATCH, STRIDE)

        patches = jax.vmap(per_image)(block)
        flat = patches.reshape((-1,) + patches.shape[2:])
        probs = clf_probs_fn(flat).reshape(block.shape[0], nh * nw, -1)
        from tpusr.pipeline.defect_pipeline import _vote
        return jax.vmap(_vote)(probs)

    cls_all, conf_all = [], []
    for s in range(0, n - chunk + 1, chunk):
        cls, conf = block_votes(jax.lax.dynamic_slice_in_dim(
            sr_images, s, chunk, 0))
        cls_all.append(np.asarray(cls))
        conf_all.append(np.asarray(conf))
    rem = n % chunk
    if rem:
        cls, conf = block_votes(sr_images[-chunk:])
        cls_all.append(np.asarray(cls)[-rem:])
        conf_all.append(np.asarray(conf)[-rem:])
    return np.concatenate(cls_all), np.concatenate(conf_all)


def _vote_scores(probs):
    """`_vote` plus trunk-side escalation-ranking signals for the cascade.

    vote_frac: fraction of patches whose argmax agrees with the final vote —
    the direct patch-disagreement signal `_vote`'s mean-prob confidence can
    hide (a trunk can be 0.7-confident on an image whose patches split
    60/40). mean_margin: mean top-2 probability gap across patches (patch
    decisiveness independent of which side each patch lands on)."""
    from tpusr.pipeline.defect_pipeline import _vote

    cls, conf = _vote(probs)
    preds = jnp.argmax(probs, axis=-1)
    vote_frac = jnp.mean((preds == cls).astype(jnp.float32))
    top2 = jnp.sort(probs, axis=-1)
    mean_margin = jnp.mean(top2[..., -1] - top2[..., -2])
    return cls, conf, vote_frac, mean_margin


def shared_trunk_votes(fn, sr_images: jnp.ndarray, chunk=16,
                       with_scores=False):
    """fn(block) -> (nb, n_patches, classes) probs (f32 or int8 trunk).

    with_scores=True additionally returns the per-image cascade ranking
    scores (vote_frac, mean_margin) from `_vote_scores`."""
    from tpusr.pipeline.defect_pipeline import _vote

    n = sr_images.shape[0]
    vote = _vote_scores if with_scores else _vote
    jfn = jax.jit(lambda b: jax.vmap(vote)(fn(b)))
    outs = []
    for s in range(0, n - chunk + 1, chunk):
        res = jfn(jax.lax.dynamic_slice_in_dim(sr_images, s, chunk, 0))
        outs.append([np.asarray(r) for r in res])
    rem = n % chunk
    if rem:
        res = jfn(sr_images[-chunk:])
        outs.append([np.asarray(r)[-rem:] for r in res])
    cols = [np.concatenate(col) for col in zip(*outs)]
    return tuple(cols) if with_scores else (cols[0], cols[1])


def _apply_sr(fn, r, lr_images: jnp.ndarray, chunk=16) -> jnp.ndarray:
    """SR a batch chunk-wise; the result STAYS on device."""
    from tpusr.models.layers import pixel_shuffle

    n = lr_images.shape[0]
    jfn = jax.jit(lambda x: pixel_shuffle(fn(x), r))
    outs = []
    for s in range(0, n - chunk + 1, chunk):
        outs.append(jfn(jax.lax.dynamic_slice_in_dim(lr_images, s, chunk, 0)))
    rem = n % chunk
    if rem:
        outs.append(jfn(lr_images[-chunk:])[-rem:])
    return jnp.concatenate(outs, axis=0)


# ------------------------------------------------------------------ gate
BOUNDARY_CONF = 0.65  # ref-confidence below this marks a "boundary" image
# trunk-confidence escalation thresholds certified for the serving cascade
CASCADE_THRESHOLDS = (0.60, 0.70, 0.80, 0.90)
# static top-K escalation fractions certified for the serving cascade —
# these rows mirror what cascade.py/bench.py actually execute (top_k by
# score inside one jit graph). Round 5 widens the sweep downward (steps of
# 1/32 = 4 images at N=128) to find the certified minimum with headroom for
# the >=500 img/s serving default; rows are derived offline from raw votes,
# so extra fracs cost nothing.
# 0.265625-0.296875 sit between the round-5 fail (0.25) and pass (0.3125)
# points of the vote_frac cascades: the per-seed zero-flip minima top out
# at 0.296875 (rank analyses), so the sweep brackets the exact certified
# minimum instead of overshooting it by half a step. 0.2734375 (35/128)
# and 0.3046875 (39/128) refine the sweep to single-image granularity at
# N=128 around the certified >=99% and zero-flip minima — every escalated
# image costs ~1.4 ms/batch at the bench geometry, so the serving default
# runs at the exact minimum, not half a step above it.
CASCADE_FRACS = (0.15625, 0.1875, 0.21875, 0.25, 0.265625, 0.2734375,
                 0.28125, 0.296875, 0.3046875, 0.3125, 0.375, 0.5)

# Trunk-collapse guard (cascade.py guard_threshold): healthy seeds measure
# escalated-subset disagreement 0.03-0.44 at the shipped frac; the collapsed
# seed 8 measures 1.00. 0.6 sits in the measured gap with margin on both
# sides, and a spurious trigger is correctness-safe (full per-patch IS the
# certified path — it only costs throughput).
CASCADE_GUARD_THRESHOLD = 0.6


def gate_row_name(sr_mode: str, clf_mode: str, border: bool = True,
                  cascade_score: str = "conf",
                  cascade_frac: float | None = None,
                  cascade_guard: bool = False) -> str:
    """The gate mode-row name a make_serving_pipeline configuration maps to.

    This is the bridge the gate-consistency test uses to assert that the
    bench/serve DEFAULTS are hard-gate certified: given the serving knobs,
    return the row name to look up in the gate artifact's aggregate. Raises
    on configurations the gate does not certify (so an uncertifiable default
    fails tests instead of shipping silently).
    """
    if clf_mode == "cascade_int8":
        if sr_mode not in ("f32", "bf16"):
            raise ValueError("the gate certifies the cascade on f32/bf16 SR "
                             f"only (got sr_mode={sr_mode!r})")
        if cascade_frac is None:
            raise ValueError("cascade_int8 needs cascade_frac")
        prefix = "cascade_int8" if sr_mode == "f32" else "bf16_sr_cascade_int8"
        score = cascade_score + ("+guard" if cascade_guard else "")
        return f"{prefix}[{score}]@frac={cascade_frac}"
    key = {
        ("f32", "per_patch_int8", True): "int8_per_patch",
        ("f32", "shared_trunk_f32", True): "shared_trunk_f32",
        ("f32", "shared_trunk_int8", True): "shared_trunk_int8",
        ("bf16", "per_patch_int8", True): "bf16_sr_per_patch_int8",
        ("bf16", "shared_trunk_int8", True): "bf16_sr_shared_trunk_int8",
        ("int8", "per_patch_f32", True): "int8_sr_f32_per_patch",
        ("int8", "per_patch_int8", True): "int8_sr_per_patch_int8",
        ("int8", "shared_trunk_int8", True): "int8_sr_shared_trunk_int8",
        ("int8", "shared_trunk_int8", False):
            "int8_sr_noborder_shared_trunk_int8",
    }.get((sr_mode, clf_mode, border))
    if key is None:
        raise ValueError(f"no gate row for sr_mode={sr_mode!r} "
                         f"clf_mode={clf_mode!r} border={border} "
                         "(per_patch_f32 on f32 SR is the reference path "
                         "itself; other combos were never gated)")
    return key


def _lex_score(vote_frac, conf, n_patches):
    """vote_frac primary, conf tie-break, exactly lexicographic: vote_frac
    is quantized to 1/n_patches steps and conf <= 1, so conf scaled by half
    a quantum can never cross a vote_frac step."""
    return vote_frac + conf * (0.5 / n_patches)


def cascade_rank_analysis(raw_votes, ref_cls, trunk_scores, n_patches=100,
                          trunk_mode="shared_trunk_int8"):
    """Which escalation score ranks the trunk's flips lowest?

    The cascade's static top-K escalation is safe iff every trunk-vs-
    reference flip sits within the K lowest-scored images — so the number
    that matters per score is (max flip rank + 1)/N, the minimal zero-flip
    static escalation fraction. Derived offline from the gate's raw votes;
    'vote_frac+conf' is the lexicographic combination cascade.py implements
    for escalate_score='vote_frac'."""
    if trunk_mode not in raw_votes or trunk_scores is None:
        return None
    cls_t, conf_t = raw_votes[trunk_mode]
    n = len(cls_t)
    flips = np.flatnonzero(np.asarray(cls_t) != np.asarray(ref_cls))
    scores = {"conf": np.asarray(conf_t),
              **{k: np.asarray(v) for k, v in trunk_scores.items()}}
    scores["vote_frac+conf"] = _lex_score(scores["vote_frac"],
                                          scores["conf"], n_patches)
    out = {"n_images": n, "trunk_flips": int(flips.size), "scores": {}}
    for name, s in scores.items():
        order = np.argsort(s, kind="stable")
        rank_of = np.empty(n, np.int64)
        rank_of[order] = np.arange(n)
        franks = sorted(int(rank_of[i]) for i in flips)
        out["scores"][name] = {
            "flip_ranks": franks,
            "min_zero_flip_escalation_frac":
                0.0 if not franks else (franks[-1] + 1) / n,
        }
    return out


# cascade parent pairs: derived-row prefix -> (trunk mode, per-patch mode).
# Each pair gets threshold + static-frac rows + a rank analysis; the bf16
# pair certifies the bf16-SR serving cascade (same classifier parents run on
# the bf16 SR image).
CASCADE_PARENTS = {
    "cascade_int8": ("shared_trunk_int8", "int8_per_patch"),
    "bf16_sr_cascade_int8": ("bf16_sr_shared_trunk_int8",
                             "bf16_sr_per_patch_int8"),
}


def derive_cascade_modes(raw_votes, ref_cls, ref_conf, labels_h,
                         trunk_scores=None, n_patches=100,
                         parents=("shared_trunk_int8", "int8_per_patch"),
                         prefix="cascade_int8"):
    """Derived cascade rows (zero extra compute).

    cascade = shared-trunk int8 votes, but low-trunk-score images are
    escalated to the exact per-patch int8 path (the hard-gate-certified
    mode, tpusr/pipeline/cascade.py). Both parents' per-image votes are
    already computed by run_gate, so every cascade variant is a pure numpy
    merge — this certifies the serving cascade at every CASCADE_THRESHOLDS
    confidence threshold AND (when trunk_scores carries vote_frac) every
    CASCADE_FRACS static top-K fraction for both ranking scores, without
    re-running the networks. ``parents``/``prefix`` select the pair
    (CASCADE_PARENTS): the default is the f32-SR cascade; the bf16 pair
    derives the bf16-SR serving cascade the same way.
    """
    trunk_mode, pp_mode = parents
    if not (trunk_mode in raw_votes and pp_mode in raw_votes):
        return []
    cls_t, conf_t = raw_votes[trunk_mode]
    cls_p, conf_p = raw_votes[pp_mode]
    out = []

    def add(name, esc):
        cls_c = np.where(esc, cls_p, cls_t)
        conf_c = np.where(esc, conf_p, conf_t)
        entry = _compare(name, ref_cls, ref_conf, cls_c, conf_c, labels_h)
        entry["escalation_fraction"] = float(esc.mean())
        # flips remaining on NON-escalated images: the cascade's only
        # failure channel (escalated images carry certified votes)
        entry["unescalated_flips"] = int(((cls_c != ref_cls) & ~esc).sum())
        out.append(entry)

    for T in CASCADE_THRESHOLDS:
        add(f"{prefix}@{T:.2f}", conf_t < T)

    rank_scores = {"conf": np.asarray(conf_t)}
    if trunk_scores is not None and "vote_frac" in trunk_scores:
        rank_scores["vote_frac"] = _lex_score(
            np.asarray(trunk_scores["vote_frac"]), np.asarray(conf_t),
            n_patches)
    n = len(cls_t)
    for sname, s in rank_scores.items():
        for frac in CASCADE_FRACS:
            k = max(1, round(n * frac))
            # k lowest-scored images, ties to lower index — matches
            # lax.top_k(-score) in cascade.py
            esc = np.zeros(n, bool)
            esc[np.argsort(s, kind="stable")[:k]] = True
            add(f"{prefix}[{sname}]@frac={frac}", esc)
            # guarded twin (cascade.py guard_threshold): the escalated
            # subset's trunk-vs-per-patch disagreement is a free trunk-
            # collapse canary; past the threshold the WHOLE batch serves
            # per-patch votes. This is the only defense against the
            # measured seed-8 failure (unanimous high-confidence
            # high-agreement trunk collapse that no ranking can escalate).
            canary = float((cls_p[esc] != cls_t[esc]).mean())
            gesc = np.ones(n, bool) if canary >= CASCADE_GUARD_THRESHOLD \
                else esc
            add(f"{prefix}[{sname}+guard]@frac={frac}", gesc)
            out[-1]["guard_canary"] = canary
            out[-1]["guard_triggered"] = bool(
                canary >= CASCADE_GUARD_THRESHOLD)
    return out


def _compare(name, ref_cls, ref_conf, cls, conf, labels_h):
    agree = float((cls == ref_cls).mean())
    flips = int((cls != ref_cls).sum())
    # boundary images: where the reference vote itself is least certain —
    # the region where confidence drift can actually flip a decision
    nearb = ref_conf < BOUNDARY_CONF
    out = {
        "mode": name,
        "vote_agreement": agree,
        "flips": flips,
        "mean_abs_conf_drift": float(np.abs(conf - ref_conf).mean()),
        "max_abs_conf_drift": float(np.abs(conf - ref_conf).max()),
        "accuracy": float((cls == labels_h).mean()),
        "pred_class1_frac": float((cls == 1).mean()),
        "boundary_images": int(nearb.sum()),
    }
    if nearb.any():
        out["boundary_vote_agreement"] = float((cls[nearb]
                                                == ref_cls[nearb]).mean())
        out["boundary_max_abs_conf_drift"] = float(
            np.abs(conf[nearb] - ref_conf[nearb]).max())
    return out


def run_gate(n_images=128, size=512, clf_steps=500, edsr_steps=600, seed=0,
             verbose=True, mode_names=None, amp_range=(0.12, 0.25),
             noise=0.01, coverage_range=(1.0, 1.0)):
    """Train at protocol scale, evaluate all serving modes, return the gate
    report dict (also see GATE.json via main()). ``coverage_range`` controls
    task difficulty — see make_surface_images."""
    from tpusr.metrics.image import psnr as psnr_fn
    from tpusr.metrics.image import ssim as ssim_fn
    from tpusr.models import VGG16Classifier
    from tpusr.models.edsr_fast import make_fused_sr_apply
    from tpusr.models.edsr_quant import make_fused_sr_apply_int8
    from tpusr.models.quant import (calibrate_vgg16, quantize_vgg16,
                                    quantized_vgg16_apply)
    from tpusr.models.vgg_trunk import (shared_trunk_probs_f32,
                                        shared_trunk_probs_int8)
    from tpusr.core.resize import resize

    t0 = time.time()
    scale = 4
    lr_hw = size // scale
    n_train = max(64, n_images // 2)

    def log(msg):
        if verbose:
            print(f"[gate {time.time() - t0:6.0f}s] {msg}", flush=True)

    log(f"dataset: {n_train} train + {n_images} eval images ({size}x{size}) "
        f"amp={amp_range} noise={noise} coverage={coverage_range}")
    hr_train, y_train = make_surface_images(seed, n_train, size,
                                            amp_range, noise, coverage_range)
    hr_eval, y_eval_dev = make_surface_images(seed + 1, n_images, size,
                                              amp_range, noise,
                                              coverage_range)
    y_eval = np.asarray(y_eval_dev)

    log(f"training VGG16 classifier ({clf_steps} steps)...")
    clf_params, train_acc = train_classifier(hr_train, y_train,
                                             steps=clf_steps, verbose=verbose)
    log(f"classifier final train-batch acc: {train_acc:.3f}")
    log(f"training EDSR x4 ({edsr_steps} steps)...")
    edsr_params = train_edsr(hr_train, steps=edsr_steps, verbose=verbose)

    # protocol LR inputs (area downscale like the degradation model's resize)
    lr_eval = resize(hr_eval, (lr_hw, lr_hw), "area")

    # only build the int8 SR variants some requested mode consumes — a
    # cheap harness smoke (mode_names subset) must not pay two full int8 SR
    # passes + calibration it never reads
    want = (lambda n: mode_names is None or n in mode_names)
    need_int8_sr = (want("int8_sr_f32_per_patch")
                    or want("int8_sr_per_patch_int8")
                    or want("int8_sr_shared_trunk_int8"))
    need_int8_sr_nb = want("int8_sr_noborder_shared_trunk_int8")
    need_bf16_sr = (want("bf16_sr_per_patch_int8")
                    or want("bf16_sr_shared_trunk_int8"))

    log("building SR variants...")
    f32_fn, r = make_fused_sr_apply(edsr_params, scale, dtype=jnp.float32)
    sr_f32 = _apply_sr(f32_fn, r, lr_eval)
    sr_int8 = sr_int8_nb = sr_bf16 = None
    psnr_sr_drift = psnr_sr_nb_drift = psnr_sr_bf16_drift = None
    ssim_sr_drift = ssim_sr_nb_drift = ssim_sr_bf16_drift = None

    ssim_jit = jax.jit(ssim_fn)  # hoisted: traced once across SR variants

    def _sr_drift(variant, chunk=16):
        # mean PSNR/SSIM of the variant's SR image vs the f32 SR image —
        # chunked like _apply_sr so HBM stays bounded at any --images,
        # everything device-resident, only scalars out
        n = sr_f32.shape[0]
        chunk = min(chunk, n)
        ps_sum = ss_sum = 0.0
        for s in range(0, n, chunk):
            a = jax.lax.dynamic_slice_in_dim(sr_f32, min(s, n - chunk),
                                             chunk, 0)
            b = jax.lax.dynamic_slice_in_dim(variant, min(s, n - chunk),
                                             chunk, 0)
            m = chunk if s + chunk <= n else n - s
            ps_sum += float(jnp.sum(psnr_fn(a, b)[-m:]))
            ss_sum += float(jnp.sum(ssim_jit(a, b)[-m:]))
        return ps_sum / n, ss_sum / n

    if need_int8_sr:
        q_fn, _ = make_fused_sr_apply_int8(edsr_params, scale,
                                           sample_lr=lr_eval[:4])
        sr_int8 = _apply_sr(q_fn, r, lr_eval)
        psnr_sr_drift, ssim_sr_drift = _sr_drift(sr_int8)
    if need_int8_sr_nb:
        q_fn_nb, _ = make_fused_sr_apply_int8(edsr_params, scale,
                                              sample_lr=lr_eval[:4],
                                              border_correction=False)
        sr_int8_nb = _apply_sr(q_fn_nb, r, lr_eval)
        psnr_sr_nb_drift, ssim_sr_nb_drift = _sr_drift(sr_int8_nb)
    if need_bf16_sr:
        bf16_fn, _ = make_fused_sr_apply(edsr_params, scale,
                                         dtype=jnp.bfloat16)
        sr_bf16 = _apply_sr(bf16_fn, r, lr_eval).astype(jnp.float32)
        psnr_sr_bf16_drift, ssim_sr_bf16_drift = _sr_drift(sr_bf16)

    # classifier variants
    model = VGG16Classifier(num_classes=2)
    calib, _, _ = make_crop_pool(seed + 300, hr_train, y_train, 32, PATCH)
    qtree = quantize_vgg16(clf_params, calibrate_vgg16(clf_params, calib))
    f32_probs = lambda p: model.apply({"params": clf_params}, p)
    int8_probs = lambda p: quantized_vgg16_apply(qtree, p)

    log("A: f32 SR + f32 per-patch (reference path)...")
    ref_cls, ref_conf = per_patch_votes(f32_probs, sr_f32)
    report = {
        "protocol": {"images": n_images, "size": size, "patch": PATCH,
                     "stride": STRIDE,
                     "patches_per_image": 100 if size == 512 else None,
                     "amp_range": list(amp_range), "noise": noise,
                     "coverage_range": list(coverage_range)},
        "training": {"clf_steps": clf_steps, "edsr_steps": edsr_steps,
                     "clf_final_train_acc": train_acc},
        "seed": seed,
        "reference_accuracy": float((ref_cls == y_eval).mean()),
        "reference_boundary_images": int((ref_conf < BOUNDARY_CONF).sum()),
        "psnr_int8_sr_vs_f32_sr_db": psnr_sr_drift,
        "psnr_int8_noborder_sr_vs_f32_sr_db": psnr_sr_nb_drift,
        "psnr_bf16_sr_vs_f32_sr_db": psnr_sr_bf16_drift,
        "ssim_int8_sr_vs_f32_sr": ssim_sr_drift,
        "ssim_int8_noborder_sr_vs_f32_sr": ssim_sr_nb_drift,
        "ssim_bf16_sr_vs_f32_sr": ssim_sr_bf16_drift,
        "modes": [],
    }

    runs = [
        ("int8_per_patch",
         lambda: per_patch_votes(int8_probs, sr_f32)),
        ("shared_trunk_f32",
         lambda: shared_trunk_votes(
             lambda b: shared_trunk_probs_f32(clf_params, b, PATCH, STRIDE),
             sr_f32)),
        ("shared_trunk_int8",
         lambda: shared_trunk_votes(
             lambda b: shared_trunk_probs_int8(qtree, b, PATCH, STRIDE),
             sr_f32, with_scores=True)),
        ("int8_sr_f32_per_patch",
         lambda: per_patch_votes(f32_probs, sr_int8)),
        # bench frontier mode: int8 SR + the reference patch protocol with
        # int8 numerics (no shared trunk)
        ("int8_sr_per_patch_int8",
         lambda: per_patch_votes(int8_probs, sr_int8)),
        ("int8_sr_shared_trunk_int8",
         lambda: shared_trunk_votes(
             lambda b: shared_trunk_probs_int8(qtree, b, PATCH, STRIDE),
             sr_int8)),
        # the bench serving configuration: composed-tail SR WITHOUT the
        # chained-tail border band (+10% e2e; deviates from EDSR.apply only
        # within pad cells of each image border)
        ("int8_sr_noborder_shared_trunk_int8",
         lambda: shared_trunk_votes(
             lambda b: shared_trunk_probs_int8(qtree, b, PATCH, STRIDE),
             sr_int8_nb)),
        # bf16-SR serving pair: same int8 classifier parents, run on the
        # bf16 SR image (near-bit-faithful to f32 SR — drift recorded above)
        ("bf16_sr_per_patch_int8",
         lambda: per_patch_votes(int8_probs, sr_bf16)),
        ("bf16_sr_shared_trunk_int8",
         lambda: shared_trunk_votes(
             lambda b: shared_trunk_probs_int8(qtree, b, PATCH, STRIDE),
             sr_bf16, with_scores=True)),
    ]
    if mode_names is not None:  # subset for cheap harness smokes
        runs = [(n, f) for n, f in runs if n in mode_names]
    raw_votes, trunk_scores_by_mode = {}, {}
    for name, fn in runs:
        log(f"{name}...")
        res = fn()
        cls, conf = res[0], res[1]
        if len(res) == 4:  # a trunk mode carries cascade rank scores
            trunk_scores_by_mode[name] = {"vote_frac": np.asarray(res[2]),
                                          "mean_margin": np.asarray(res[3])}
        raw_votes[name] = (np.asarray(cls), np.asarray(conf))
        report["modes"].append(_compare(name, ref_cls, ref_conf, cls, conf,
                                        y_eval))

    from tpusr.core.pad import pad_amounts
    from tpusr.core.patches import patch_grid_size

    pad_h, pad_w = pad_amounts(size, size, PATCH, STRIDE)
    nh, nw = patch_grid_size(size + pad_h, size + pad_w, PATCH, STRIDE)
    n_patches = nh * nw
    for prefix, (tname, pname) in CASCADE_PARENTS.items():
        ts = trunk_scores_by_mode.get(tname)
        report["modes"].extend(
            derive_cascade_modes(raw_votes, ref_cls, ref_conf, y_eval,
                                 trunk_scores=ts, n_patches=n_patches,
                                 parents=(tname, pname), prefix=prefix))
        rank = cascade_rank_analysis(raw_votes, ref_cls, ts, n_patches,
                                     trunk_mode=tname)
        if rank is not None:
            key = ("cascade_rank_analysis" if prefix == "cascade_int8"
                   else f"{prefix}_rank_analysis")
            report[key] = rank

    # raw per-image votes (small: N ints + N floats per mode) so thresholds
    # can be re-derived offline without re-training
    report["raw_votes"] = {
        "reference": {"cls": np.asarray(ref_cls).tolist(),
                      "conf": np.round(np.asarray(ref_conf), 4).tolist()},
        **{name: {"cls": c.tolist(),
                  "conf": np.round(f, 4).tolist()}
           for name, (c, f) in raw_votes.items()},
    }
    for tname, scores in trunk_scores_by_mode.items():
        report["raw_votes"][tname].update(
            {k: np.round(v, 4).tolist() for k, v in scores.items()})

    report["gate_standard"] = {
        "min_vote_agreement": 0.99,
        "min_reference_accuracy": 0.85,
        # an SR-image-modifying mode is "image_faithful" only if its SR
        # output holds >= 35 dB vs the f32 SR image (EDSR_model.py:189-315:
        # the SR image is a user deliverable, not just classifier input);
        # below that the mode is classify-only
        "min_image_faithful_psnr_db": 35.0,
    }
    report["meaningful"] = (report["reference_accuracy"] >= 0.85
                            and 0.1 <= float((ref_cls == 1).mean()) <= 0.9)
    report["elapsed_sec"] = round(time.time() - t0, 1)
    sr_psnr_of_mode = {  # which SR variant each mode serves (None = f32 SR)
        "int8_sr_f32_per_patch": psnr_sr_drift,
        "int8_sr_per_patch_int8": psnr_sr_drift,
        "int8_sr_shared_trunk_int8": psnr_sr_drift,
        "int8_sr_noborder_shared_trunk_int8": psnr_sr_nb_drift,
        "bf16_sr_per_patch_int8": psnr_sr_bf16_drift,
        "bf16_sr_shared_trunk_int8": psnr_sr_bf16_drift,
    }
    for m in report["modes"]:
        m["passes_gate"] = m["vote_agreement"] >= 0.99
        sr_psnr = sr_psnr_of_mode.get(m["mode"])
        if sr_psnr is None and m["mode"].startswith("bf16_sr_cascade"):
            sr_psnr = psnr_sr_bf16_drift  # derived rows serve the bf16 SR
        if sr_psnr is not None:
            m["sr_psnr_vs_f32_db"] = sr_psnr
            m["image_faithful"] = sr_psnr >= 35.0
    return report


# calibrated so the trained f32 reference path lands near the reference's
# real operating point (VGG16.ipynb cell 8: 0.9205) instead of the
# perfectly-separable round-3 task: "hard" defect images carry stripes on
# only a random fraction of the surface, so low-coverage images get
# genuinely near-0.5 patch votes (see make_surface_images)
TASKS = {
    "easy": {"amp_range": (0.12, 0.25), "noise": 0.01,
             "coverage_range": (1.0, 1.0)},
    "hard": {"amp_range": (0.12, 0.25), "noise": 0.01,
             "coverage_range": (0.35, 1.0)},
}


def aggregate_runs(runs):
    """Cross-seed aggregation: a mode passes only if it clears the 99% vote
    agreement bar on EVERY seed."""
    by_mode = {}
    for rep in runs:
        for m in rep["modes"]:
            by_mode.setdefault(m["mode"], []).append(m)
    agg = {
        "seeds": [r["seed"] for r in runs],
        "images_total": sum(r["protocol"]["images"] for r in runs),
        "reference_accuracy_per_seed": [r["reference_accuracy"]
                                        for r in runs],
        "reference_boundary_images_total": sum(
            r["reference_boundary_images"] for r in runs),
        "modes": [],
    }
    seeds_of_mode = {}
    for rep in runs:
        for m in rep["modes"]:
            seeds_of_mode.setdefault(m["mode"], []).append(rep["seed"])
    for name, ms in by_mode.items():
        entry = {
            "mode": name,
            # seeds that actually ran this mode: subset --modes runs and
            # seed-appended merges give modes uneven support, and a
            # "passes on all seeds" claim is only as strong as this list
            "seeds": seeds_of_mode[name],
            "min_vote_agreement": min(m["vote_agreement"] for m in ms),
            "mean_vote_agreement": float(np.mean([m["vote_agreement"]
                                                  for m in ms])),
            "total_flips": sum(m["flips"] for m in ms),
            "max_abs_conf_drift": max(m["max_abs_conf_drift"] for m in ms),
            "passes_gate_all_seeds": all(m["passes_gate"] for m in ms),
        }
        bvals = [m["boundary_vote_agreement"] for m in ms
                 if "boundary_vote_agreement" in m]
        if bvals:
            entry["min_boundary_vote_agreement"] = min(bvals)
        if any("escalation_fraction" in m for m in ms):
            entry["max_escalation_fraction"] = max(
                m["escalation_fraction"] for m in ms)
            entry["total_unescalated_flips"] = sum(
                m["unescalated_flips"] for m in ms)
        if any("image_faithful" in m for m in ms):
            entry["image_faithful_all_seeds"] = all(
                m.get("image_faithful", True) for m in ms)
        agg["modes"].append(entry)
    return agg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--images", type=int, default=128)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--clf-steps", type=int, default=500)
    ap.add_argument("--edsr-steps", type=int, default=600)
    ap.add_argument("--seeds", default="0",
                    help="comma-separated seeds; each gets its own dataset "
                         "+ training + full mode matrix")
    ap.add_argument("--task", choices=sorted(TASKS), default="easy",
                    help="difficulty preset (hard ~= the reference's 0.92 "
                         "operating point)")
    ap.add_argument("--amp-lo", type=float, default=None)
    ap.add_argument("--amp-hi", type=float, default=None)
    ap.add_argument("--noise", type=float, default=None)
    ap.add_argument("--cov-lo", type=float, default=None)
    ap.add_argument("--cov-hi", type=float, default=None)
    ap.add_argument("--modes", default=None,
                    help="comma-separated mode subset (default: all); the "
                         "derived cascade rows need both shared_trunk_int8 "
                         "and int8_per_patch")
    ap.add_argument("--out", default="GATE.json")
    args = ap.parse_args(argv)
    preset = TASKS[args.task]
    amp = (preset["amp_range"][0] if args.amp_lo is None else args.amp_lo,
           preset["amp_range"][1] if args.amp_hi is None else args.amp_hi)
    noise = preset["noise"] if args.noise is None else args.noise
    cov = (preset["coverage_range"][0] if args.cov_lo is None else args.cov_lo,
           preset["coverage_range"][1] if args.cov_hi is None else args.cov_hi)
    seeds = [int(s) for s in args.seeds.split(",")]

    runs = []
    for seed in seeds:
        print(f"=== seed {seed} ===", flush=True)
        runs.append(run_gate(args.images, args.size, args.clf_steps,
                             args.edsr_steps, seed, amp_range=amp,
                             noise=noise, coverage_range=cov,
                             mode_names=(args.modes.split(",")
                                         if args.modes else None)))
    report = {"task": {"name": args.task, "amp_range": list(amp),
                       "noise": noise, "coverage_range": list(cov)},
              "aggregate": aggregate_runs(runs), "runs": runs}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"task": report["task"],
                      "aggregate": report["aggregate"]}, indent=2))


if __name__ == "__main__":
    main()

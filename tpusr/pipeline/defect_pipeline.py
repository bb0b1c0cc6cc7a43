"""Defect-detection pipeline: patch-vote classification and the fused
LR -> SR -> classify graph (the BASELINE north-star, config #4).

This reconstructs the reference's missing ``SRModels/defect_detection_pipeline
.ipynb`` (listed in ``.MISSING_LARGE_BLOBS``) from its consumer APIs:
``load_predictions_dataset`` (loading_methods.py:288-386), the per-model
``super_resolve_image`` methods, ``classify_defects_method``
(VGG16_model.py:168-270), and the comparison plotters
(deep_lerning_visualizations.py:230-549).

Key design difference from the reference: the whole per-image chain —
SR network, patch extraction, classifier, majority vote — is ONE jit'd XLA
graph over a batch of LR images. No host round-trips between stages.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.core.pad import pad_amounts
from tpusr.core.patches import patch_grid_size, patchify
from tpusr.metrics.image import psnr as psnr_fn, ssim as ssim_fn


def _vote(probs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Majority vote over patch probabilities with the reference's tie-break
    (VGG16_model.py:252-270): most votes; ties broken by higher mean
    probability; confidence = mean prob of the winning class."""
    num_classes = probs.shape[-1]
    preds = jnp.argmax(probs, axis=-1)
    votes = jnp.zeros((num_classes,), jnp.float32).at[preds].add(1.0)
    mean_probs = jnp.mean(probs, axis=0)
    # mean_probs < 1 <= one vote, so adding it implements lexicographic
    # (votes, mean_prob) comparison exactly.
    winner = jnp.argmax(votes + mean_probs)
    confidence = mean_probs[winner]
    return winner, confidence


def make_patch_classifier(clf_apply, image_hw: tuple[int, int], patch: int,
                          stride: int | None = None):
    """Compile image -> (class, confidence) patch-vote classification for a
    fixed image shape. `clf_apply(patches)` -> (N, num_classes) probs."""
    stride = stride if stride is not None else max(1, patch // 2)
    h, w = image_hw
    pad_h, pad_w = pad_amounts(h, w, patch, stride)

    @jax.jit
    def fn(image):
        x = jnp.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        patches = patchify(x, patch, stride)
        probs = clf_apply(patches)
        return _vote(probs)

    return fn


def classify_defects(clf_apply, image, patch: int, stride: int | None = None):
    """One-shot patch-vote classification (classify_defects_method parity).

    Compiled classifiers are cached per (clf_apply, shape, patch, stride) —
    looping over a dataset (the reference's usage pattern) re-traces nothing.
    """
    from tpusr.pipeline.inference import _cache_get, _cache_put

    image = jnp.asarray(np.asarray(image, np.float32))
    key = ("clf", id(clf_apply), image.shape[:2], patch, stride)
    fn = _cache_get(key, clf_apply)
    if fn is None:
        fn = _cache_put(key, clf_apply,
                        make_patch_classifier(clf_apply, image.shape[:2],
                                              patch, stride))
    cls, conf = fn(image)
    return int(cls), float(conf)


class FusedSRClassifyPipeline:
    """LR image batch -> SR -> patch-vote defect classification, one jit graph.

    `sr_apply(lr_batch)` maps (N, h, w, 3) [0,1] -> (N, h*scale, w*scale, 3)
    [0,1] (full-image SR — on TPU the whole 128->512 conv stack fits without
    the reference's patch decomposition; patch mode remains available through
    tpusr.pipeline.inference for large inputs).
    `clf_apply(patches)` maps (M, patch, patch, 3) -> (M, num_classes) probs.
    """

    def __init__(self, sr_apply, clf_apply=None, lr_hw: tuple[int, int] = None,
                 scale: int = None, patch: int = 96, stride: int | None = None,
                 mesh=None, classify_chunks: int = 1, pre_quant=None,
                 trunk_probs=None, cascade_votes=None):
        """classify_chunks > 1 runs the patchify+classify stage over image
        sub-batches via lax.map — same results, lower peak memory (the patch
        tensor is the pipeline's largest intermediate). `pre_quant` optionally
        maps the SR batch to the classifier's input dtype BEFORE patch
        extraction (e.g. tpusr.models.quant.quantize_input: int8 patches are
        4x smaller than f32).

        `trunk_probs` replaces the per-patch classifier with a shared-trunk
        one: ``trunk_probs(images) -> (N, n_patches, classes)`` probs in the
        same row-major patch order (e.g. tpusr.models.vgg_trunk — one
        full-image conv trunk, ~2.9x fewer MACs; serving-gated).

        `cascade_votes` replaces the classify+vote stage entirely:
        ``cascade_votes(images, n_valid) -> (classes, confidences)`` (e.g.
        tpusr.pipeline.cascade — shared-trunk votes with static top-K
        escalation of low-confidence images to the exact per-patch path;
        ``n_valid`` masks batch-padding rows out of the escalation ranking).

        Exactly one of `clf_apply` / `trunk_probs` / `cascade_votes` must be
        given."""
        if sum(x is not None
               for x in (clf_apply, trunk_probs, cascade_votes)) != 1:
            raise ValueError("pass exactly one of clf_apply / trunk_probs / "
                             "cascade_votes")
        if lr_hw is None or scale is None:
            raise ValueError(
                "lr_hw and scale are required (the pipeline compiles for one "
                "static LR geometry), e.g. lr_hw=(128, 128), scale=4")
        self.lr_hw = lr_hw
        self.scale = scale
        self.patch = patch
        self.stride = stride if stride is not None else max(1, patch // 2)
        self.mesh = mesh

        h, w = lr_hw
        hr_h, hr_w = h * scale, w * scale
        pad_h, pad_w = pad_amounts(hr_h, hr_w, patch, self.stride)
        nh, nw = patch_grid_size(hr_h + pad_h, hr_w + pad_w, patch, self.stride)
        n_patches = nh * nw
        stride_ = self.stride
        patch_ = patch

        def classify_block(sr_block):
            def per_image(img):
                x = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
                return patchify(x, patch_, stride_)

            patches = jax.vmap(per_image)(sr_block)        # (n, P, p, p, 3)
            flat = patches.reshape((-1,) + patches.shape[2:])
            probs = clf_apply(flat)
            return probs.reshape(sr_block.shape[0], n_patches, -1)

        def run(lr_batch, n_valid):
            sr = sr_apply(lr_batch)  # (N, hr_h, hr_w, 3)
            srq = pre_quant(sr) if pre_quant is not None else sr
            n = srq.shape[0]
            if cascade_votes is not None:
                classes, confs = cascade_votes(srq, n_valid)
                return sr, classes, confs
            if trunk_probs is not None:
                probs = trunk_probs(srq)
            elif classify_chunks > 1:
                if n % classify_chunks:
                    # falling back to one unchunked block would materialize
                    # the full patch tensor — the exact OOM chunking exists
                    # to prevent; fail loudly instead
                    raise ValueError(
                        f"batch size {n} is not divisible by "
                        f"classify_chunks={classify_chunks}; pick a batch "
                        f"that divides evenly (or classify_chunks=1)")
                blocks = srq.reshape((classify_chunks, n // classify_chunks)
                                     + srq.shape[1:])
                probs = jax.lax.map(classify_block, blocks)
                probs = probs.reshape((n, n_patches, -1))
            else:
                probs = classify_block(srq)
            classes, confs = jax.vmap(_vote)(probs)
            return sr, classes, confs

        self._run_jit = jax.jit(run)

    def _run(self, lr_batch, n_valid=None):
        """Jitted pipeline on an already-device-placed batch. ``n_valid`` is
        a traced scalar (no recompile per value) marking rows >= n_valid as
        batch padding — only the cascade path consumes it (pad rows must not
        win escalation slots); other paths ignore it."""
        if n_valid is None:
            n_valid = lr_batch.shape[0]
        return self._run_jit(lr_batch, jnp.int32(n_valid))

    def __call__(self, lr_batch, n_valid=None):
        """Returns (sr_batch, classes, confidences) — all device arrays.
        With a ``mesh``, the batch is sharded over its 'data' axis before
        the jitted graph runs (re-putting an already-sharded input is free),
        so the pipeline actually executes data-parallel instead of silently
        running on one device."""
        x = jnp.asarray(lr_batch)
        if self.mesh is not None and x.shape[0] % self.mesh.shape["data"] == 0:
            from tpusr.dist.mesh import shard_batch
            x = shard_batch(self.mesh, x)
        return self._run(x, n_valid)

    def throughput(self, lr_batch, iters: int = 10) -> float:
        """Steady-state images/sec for the fused graph."""
        lr_batch = jnp.asarray(lr_batch)
        out = self._run(lr_batch)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = self._run(lr_batch)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        return lr_batch.shape[0] * iters / dt


def make_serving_pipeline(edsr_params, clf_params, lr_hw: tuple[int, int],
                          scale: int, patch: int = 96, stride: int = 48,
                          sr_mode: str = "int8",
                          clf_mode: str = "shared_trunk_int8",
                          calib_lr=None, calib_patches=None, mesh=None,
                          sr_border_correction: bool = True,
                          cascade_escalate_frac: float = 0.25,
                          cascade_escalate_score: str = "conf",
                          cascade_guard_threshold: float | None = None):
    """Production serving pipeline: trained EDSR + VGG16 params -> a
    ``FusedSRClassifyPipeline`` wired with the gated fast paths.

    sr_mode:  'f32' (parity) | 'bf16' | 'int8' (PTQ, needs ``calib_lr``) —
              all use the fused-linear-tail forward (edsr_fast/edsr_quant);
              ``sr_border_correction=False`` additionally drops the
              chained-tail border band on the int8 path (gated: GATE.json
              'int8_sr_noborder*', ~+10% e2e).
    clf_mode: 'per_patch_f32' (reference parity path) | 'per_patch_int8'
              (needs ``calib_patches``) | 'shared_trunk_f32' |
              'shared_trunk_int8' — shared-trunk runs ONE full-image conv
              trunk (~2.9x fewer MACs, tpusr.models.vgg_trunk) — |
              'cascade_int8': shared-trunk votes with the
              ``cascade_escalate_frac`` lowest-scored images of each batch
              re-classified by the exact per-patch int8 path
              (tpusr.pipeline.cascade; ``cascade_escalate_score`` in
              {'conf', 'vote_frac'} picks the ranking signal — certified
              per threshold/fraction/score in GATE_r05.json's derived
              cascade rows and `cascade_rank_analysis`; 'vote_frac' is
              the certified default, 'conf' was demoted on fresh seeds).
              ``cascade_guard_threshold`` arms the trunk-collapse guard
              (escalated-subset disagreement canary -> full per-patch
              fallback; see tpusr.pipeline.cascade): 0.6 is the certified
              setting — REQUIRED for the 9-seed certification, since one
              fresh seed collapsed the unguarded trunk (GATE_r05.json).

    Every non-parity mode is a serving mode in the int8 sense: validated at
    protocol scale by ``python -m tpusr.tools.serving_gate`` (>=99% vote
    agreement standard, GATE.json); 'f32' + 'per_patch_f32' reproduces the
    reference protocol exactly (VGG16_model.py:168-270).
    """
    from tpusr.models import VGG16Classifier
    from tpusr.models.edsr_fast import make_fused_sr_apply
    from tpusr.models.layers import pixel_shuffle

    if sr_mode == "int8":
        from tpusr.models.edsr_quant import make_fused_sr_apply_int8

        if calib_lr is None:
            raise ValueError("sr_mode='int8' needs a calib_lr batch")
        poly_fn, r = make_fused_sr_apply_int8(
            edsr_params, scale, sample_lr=calib_lr,
            border_correction=sr_border_correction)
    elif sr_mode in ("f32", "bf16"):
        dtype = jnp.float32 if sr_mode == "f32" else jnp.bfloat16
        poly_fn, r = make_fused_sr_apply(edsr_params, scale, dtype=dtype)
    else:
        raise ValueError(f"unknown sr_mode {sr_mode!r}")
    sr_apply = lambda x: pixel_shuffle(poly_fn(x), r).astype(jnp.float32)

    num_classes = int(clf_params["predictions"]["bias"].shape[0])
    model = VGG16Classifier(num_classes=num_classes)
    clf_apply = trunk_probs = cascade_votes = pre_quant = None
    if clf_mode.endswith("int8"):
        from tpusr.models.quant import (calibrate_vgg16, quantize_input,
                                        quantize_vgg16)

        if calib_patches is None:
            raise ValueError(f"clf_mode={clf_mode!r} needs calib_patches")
        qtree = quantize_vgg16(clf_params,
                               calibrate_vgg16(clf_params, calib_patches))
        pre_quant = lambda sr: quantize_input(qtree, sr)
    if clf_mode == "per_patch_f32":
        clf_apply = lambda p: model.apply({"params": clf_params}, p)
    elif clf_mode == "per_patch_int8":
        from tpusr.models.quant import quantized_vgg16_apply

        clf_apply = lambda p: quantized_vgg16_apply(qtree, p)
    elif clf_mode == "shared_trunk_f32":
        from tpusr.models.vgg_trunk import shared_trunk_probs_f32

        trunk_probs = lambda imgs: shared_trunk_probs_f32(
            clf_params, imgs, patch, stride)
    elif clf_mode == "shared_trunk_int8":
        from tpusr.models.vgg_trunk import shared_trunk_probs_int8

        trunk_probs = lambda imgs: shared_trunk_probs_int8(
            qtree, imgs, patch, stride)
    elif clf_mode == "cascade_int8":
        from tpusr.pipeline.cascade import make_cascade_votes

        cascade_votes = make_cascade_votes(
            qtree, patch, stride, escalate_frac=cascade_escalate_frac,
            escalate_score=cascade_escalate_score,
            guard_threshold=cascade_guard_threshold)
    else:
        raise ValueError(f"unknown clf_mode {clf_mode!r}")

    return FusedSRClassifyPipeline(
        sr_apply, clf_apply=clf_apply, lr_hw=lr_hw, scale=scale, patch=patch,
        stride=stride, mesh=mesh, pre_quant=pre_quant,
        trunk_probs=trunk_probs, cascade_votes=cascade_votes)


def run_defect_detection_comparison(sr_methods: dict, clf_apply, x_lr, x_hr, y,
                                    patch: int = 96, stride: int | None = None,
                                    batch_size: int = 16, verbose: bool = True):
    """The missing ``defect_detection_pipeline.ipynb``, as a function.

    For each SR method name -> `sr_apply(lr_batch) -> sr_batch` ([0,1] in/out),
    super-resolve every prediction image, patch-vote classify it, and collect
    per-method results: predictions, confidences, accuracy, confusion matrix,
    SR fidelity (PSNR/SSIM vs HR), and SR wall time. The result dict feeds the
    cross-model comparison panels (tpusr.viz.dl_viz).
    """
    x_lr = np.asarray(x_lr, np.float32)
    x_hr = np.asarray(x_hr, np.float32)
    y = np.asarray(y)
    n = x_lr.shape[0]
    hr_hw = x_hr.shape[1:3]
    results: dict[str, dict] = {}

    for name, sr_apply in sr_methods.items():
        scale = hr_hw[0] // x_lr.shape[1]
        pipe = FusedSRClassifyPipeline(sr_apply, clf_apply, x_lr.shape[1:3],
                                       scale, patch, stride)
        # Timing hygiene (reference timed pure model.predict,
        # EDSR_model.py:265-303): every batch is padded to one compiled
        # shape (no trailing-batch recompile), one warm-up batch runs before
        # the clock, and only the pipeline call is timed — each timed region
        # ends with the small (batch,) class transfer as the device barrier.
        bs = min(batch_size, n)
        np.asarray(pipe(x_lr[:bs])[1])  # compile + warm-up, untimed
        preds, confs, psnrs, ssims = [], [], [], []
        elapsed = 0.0
        for s in range(0, n, bs):
            xb = x_lr[s:s + bs]
            hb = x_hr[s:s + bs]
            nb = xb.shape[0]
            if nb < bs:  # pad to the compiled shape, slice results after
                xb = np.concatenate([xb, np.repeat(xb[-1:], bs - nb, axis=0)])
            t0 = time.perf_counter()
            sr, cls, conf = pipe(xb)
            cls_h = np.asarray(cls)  # device->host barrier inside the clock
            elapsed += time.perf_counter() - t0
            preds.append(cls_h[:nb])
            confs.append(np.asarray(conf)[:nb])
            psnrs.append(np.asarray(psnr_fn(jnp.asarray(hb), sr[:nb])))
            ssims.append(np.asarray(ssim_fn(jnp.asarray(hb), sr[:nb])))

        preds = np.concatenate(preds)[:n]
        confs = np.concatenate(confs)[:n]
        psnrs = np.concatenate(psnrs)[:n]
        ssims = np.concatenate(ssims)[:n]
        # size from labels AND predictions: a class the classifier emits but
        # the label subset lacks must not index out of the matrix
        num_classes = int(max(2, y.max() + 1, preds.max() + 1))
        cm = np.zeros((num_classes, num_classes), np.int64)
        for t, p in zip(y, preds):
            cm[int(t), int(p)] += 1
        acc = float((preds == y).mean())
        correct = preds == y
        results[name] = {
            "predictions": preds,
            "confidences": confs,
            "accuracy": acc,
            "confusion_matrix": cm,
            "psnr_mean": float(psnrs.mean()),
            "ssim_mean": float(ssims.mean()),
            "time_sec": elapsed,
            "mean_confidence": float(confs.mean()),
            "mean_confidence_correct": float(confs[correct].mean()) if correct.any() else np.nan,
            "mean_confidence_wrong": float(confs[~correct].mean()) if (~correct).any() else np.nan,
            "error_rate": 1.0 - acc,
        }
        if verbose:
            print(f"{name}: acc={acc:.4f} psnr={results[name]['psnr_mean']:.2f} "
                  f"time={elapsed:.2f}s")
    return results

"""tpusr command-line entry points — replace the reference's 7 notebooks (L6).

    python -m tpusr.cli preprocess  --video v.mp4 --hr-dir HR --lr-dir LR ...
    python -m tpusr.cli classic     --hr-dir HR --lr-dir LR --out results/
    python -m tpusr.cli train-srcnn --hr-dir HR --lr-dir LR --interp-map m.pkl ...
    python -m tpusr.cli train-edsr  --hr-dir HR --lr-dir LR ...
    python -m tpusr.cli train-esrgan --hr-dir HR --lr-dir LR ...
    python -m tpusr.cli train-vgg16 --hr-dir HR --class-map c.pkl ...
    python -m tpusr.cli pipeline    --lr-dir LRp --hr-dir HRp --class-map c.pkl ...
    python -m tpusr.cli eda         --hr-dir HR --lr-dir LR --out eda_results/

Every run-to-completion notebook flow (load -> split(seed 42) -> train ->
evaluate -> save checkpoint + metrics JSON + figures) is reproduced, with
orbax checkpoints in place of .h5 and JSON in place of metric pickles.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys


def _split(x, y, seed=42, test_size=0.2, val_size=0.1):
    """train/val/test split with the notebooks' seed-42 convention."""
    from sklearn.model_selection import train_test_split

    x_tr, x_te, y_tr, y_te = train_test_split(x, y, test_size=test_size,
                                              random_state=seed)
    rel = val_size / (1.0 - test_size)
    x_tr, x_va, y_tr, y_va = train_test_split(x_tr, y_tr, test_size=rel,
                                              random_state=seed)
    return x_tr, y_tr, x_va, y_va, x_te, y_te


def _timestamp():
    return datetime.datetime.now().strftime("%Y%m%d_%H%M%S")


def _save_run(out_dir, name, state, history, eval_metrics, tt, mt):
    from tpusr.train import save_checkpoint
    from tpusr.train.logging import MetricsLogger, jsonl_to_csv

    ts = _timestamp()
    meta = {
        "eval": eval_metrics,
        "history": history,
        "epoch_time_sec": tt.epoch_times_sec,
        "memory": mt.as_dict(),
        "timestamp": ts,
    }
    path = save_checkpoint(out_dir, f"{name}_{ts}", state, metadata=meta)
    # observability sidecar: per-epoch JSONL + CSV next to the checkpoint
    jl = os.path.join(out_dir, f"{name}_{ts}.metrics.jsonl")
    epochs = max((len(v) for v in history.values() if isinstance(v, list)),
                 default=0)
    with MetricsLogger(jl, run_name=f"{name}_{ts}") as logger:
        for e in range(epochs):
            rec = {k: v[e] for k, v in history.items()
                   if isinstance(v, list) and len(v) > e}
            logger.log_epoch(e, rec)
        logger.log("eval", epochs, eval_metrics)
    jsonl_to_csv(jl, jl[: -len(".jsonl")] + ".csv", scope="epoch")
    print(f"saved {path}")
    return path


def _maybe_resume(args, trainer, init_state_args):
    """--resume <checkpoint-path>: restore a full TrainState/GANState (params
    AND optimizer state — true mid-training resume, which the reference's
    end-of-run .h5 saves cannot do) and hand it to fit via state=."""
    path = getattr(args, "resume", None)
    if not path:
        return None
    from tpusr.train import restore_checkpoint

    template = trainer.init_state(*init_state_args)
    state = restore_checkpoint(os.path.dirname(os.path.abspath(path)),
                               os.path.basename(path), template)
    if trainer.mesh is not None:  # --data-parallel: restored host arrays
        from tpusr.dist.mesh import replicate
        state = replicate(trainer.mesh, state)
    print(f"resumed from {path}")
    return state


def _ckpt_kwargs(args):
    """--checkpoint-every N: periodic async resume points (epoch_NNNN under
    --out), pairing with --resume for preemption-tolerant runs. When resuming
    from a periodic point, numbering continues from its recorded epoch so a
    restarted run never overwrites newer progress with smaller labels."""
    every = getattr(args, "checkpoint_every", 0)
    if not every:
        return {}
    offset = 0
    resume = getattr(args, "resume", None)
    if resume:
        from tpusr.train.checkpoint import load_metadata
        meta = load_metadata(os.path.dirname(os.path.abspath(resume)),
                             os.path.basename(resume))
        offset = int((meta or {}).get("epoch", 0))
    return {"checkpoint_dir": args.out, "checkpoint_every": every,
            "checkpoint_offset": offset}


def cmd_preprocess(args):
    from tpusr.data.video import (create_hr_lr_images_from_video,
                                  create_hr_lr_prediction_images_from_video)

    fn = (create_hr_lr_prediction_images_from_video if args.predictions
          else create_hr_lr_images_from_video)
    kwargs = dict(video_path=args.video, hr_dir=args.hr_dir, lr_dir=args.lr_dir,
                  skip_seconds=args.skip_seconds,
                  frame_interval_seconds=args.frame_interval,
                  hr_size=args.hr_size, prefix=args.prefix, seed=args.seed,
                  max_frames=args.max_frames)
    if args.predictions:
        written = fn(class_id=args.class_id,
                     predictions_class_map_path=args.class_map, **kwargs)
    else:
        written = fn(interpolation_map_path=args.interp_map,
                     class_labels_map_path=args.class_map,
                     class_id=args.class_id, **kwargs)
    print(f"wrote {len(written)} HR/LR pairs")


def cmd_classic(args):
    import cv2
    from tpusr.data.loading import get_all_image_paths
    from tpusr.classic import run_classic_comparison, CLASSIC_ALGORITHMS
    from tpusr.classic.harness import RANKING_WEIGHTS
    from tpusr.viz import (plot_time_memory_panels, plot_psnr_ssim_panels,
                           plot_speed_quality_tradeoff_3d, plot_error_metrics_grid,
                           plot_edge_metrics_grid,
                           plot_frequency_distribution_metrics_grid,
                           show_algorithm_ranking)

    hr_d = {os.path.basename(p): p for p in get_all_image_paths(args.hr_dir)}
    lr_d = {os.path.basename(p): p for p in get_all_image_paths(args.lr_dir)}
    common = sorted(set(hr_d) & set(lr_d))
    common = common[: int(args.fraction * len(common))]  # notebook: 70%
    if args.limit:
        common = common[: args.limit]
    def load(p):
        img = cv2.imread(p)
        if img is None:
            raise ValueError(f"could not read image: {p}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    hr_images = [load(hr_d[b]) for b in common]
    lr_images = [load(lr_d[b]) for b in common]
    print(f"evaluating {len(common)} HR/LR pairs over {len(CLASSIC_ALGORITHMS)} algorithms")

    summary, ranked, scores, _ = run_classic_comparison(hr_images, lr_images)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "classic_summary.json"), "w") as f:
        json.dump({"summary": summary,
                   "ranked": [[a, s] for a, s in ranked]}, f, indent=2,
                  default=float)

    colors = {"bilinear": "#4c72b0", "bicubic": "#55a868", "area": "#c44e52",
              "lanczos": "#8172b2", "ibp": "#ccb974", "nlm": "#64b5cd",
              "egi": "#8c8c8c", "freq": "#937860"}
    out = args.out
    plot_time_memory_panels(summary, CLASSIC_ALGORITHMS, colors,
                            "Classical SR Profiling: Time & Memory",
                            os.path.join(out, "time_memory_summary.png"))
    plot_psnr_ssim_panels(summary, CLASSIC_ALGORITHMS, colors,
                          "Classical SR: PSNR / SSIM",
                          os.path.join(out, "psnr_ssim_summary.png"))
    plot_speed_quality_tradeoff_3d(summary, CLASSIC_ALGORITHMS, colors,
                                   results_dir=out)
    plot_error_metrics_grid(summary, CLASSIC_ALGORITHMS, colors, results_dir=out)
    plot_edge_metrics_grid(summary, CLASSIC_ALGORITHMS, colors, results_dir=out)
    plot_frequency_distribution_metrics_grid(summary, CLASSIC_ALGORITHMS, colors,
                                             results_dir=out)
    show_algorithm_ranking(summary, maximize=["psnr_mean", "ssim_mean"],
                           minimize=["time_mean", "memory_mean", "mae_mean",
                                     "rmse_mean", "grad_mse_mean",
                                     "kl_luma_mean", "kl_color_mean"],
                           weights=RANKING_WEIGHTS, results_dir=out,
                           colors_map=colors)
    for a, s in ranked:
        print(f"{a}: {s:.4f}")


def _load_sr_patches(args, mode, patch, stride, scale):
    from tpusr.data import load_dataset_as_patches

    if mode == "srcnn":
        x, y, hr_h, hr_w = load_dataset_as_patches(
            args.hr_dir, args.lr_dir, mode="srcnn", patch_size=patch,
            stride=stride, interpolation_map_path=args.interp_map)
        return x, y, (hr_h, hr_w)
    x, y = load_dataset_as_patches(args.hr_dir, args.lr_dir, mode="scale",
                                   patch_size=patch, stride=stride,
                                   scale_factor=scale)
    return x, y, None


def cmd_train_srcnn(args):
    from tpusr.config import SRCNNConfig
    from tpusr.models import SRCNN
    from tpusr.train import SupervisedSRTrainer
    from tpusr.dist import make_mesh

    cfg = SRCNNConfig(batch_size=args.batch_size, epochs=args.epochs,
                      learning_rate=args.lr)
    x, y, hr_hw = _load_sr_patches(args, "srcnn", cfg.patch_size, cfg.stride, 1)
    x_tr, y_tr, x_va, y_va, x_te, y_te = _split(x, y)
    mesh = make_mesh() if args.data_parallel else None
    trainer = SupervisedSRTrainer(
        SRCNN(), learning_rate=cfg.learning_rate, mesh=mesh,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    res = trainer.fit(x_tr, y_tr, x_va, y_va, batch_size=cfg.batch_size,
                      epochs=cfg.epochs, es_patience=cfg.es_patience,
                      plateau_patience=cfg.plateau_patience,
                      state=_maybe_resume(args, trainer, (x_tr[:1],)),
                      **_ckpt_kwargs(args))
    ev = trainer.evaluate(res.state, x_te, y_te, batch_size=cfg.batch_size)
    print(f"Loss: {ev['loss']:.4f}, PSNR: {ev['psnr']:.2f} dB, SSIM: {ev['ssim']:.4f}")
    meta_eval = {**ev, "hr_h": hr_hw[0], "hr_w": hr_hw[1]}
    _save_run(args.out, "SRCNN", res.state, res.history, meta_eval,
              res.time_tracker, res.memory_tracker)


def cmd_train_edsr(args):
    from tpusr.config import EDSRConfig
    from tpusr.models import EDSR
    from tpusr.train import SupervisedSRTrainer
    from tpusr.dist import make_mesh

    cfg = EDSRConfig(batch_size=args.batch_size, epochs=args.epochs,
                     learning_rate=args.lr, scale_factor=args.scale)
    x, y, _ = _load_sr_patches(args, "scale", cfg.patch_size, cfg.stride,
                               cfg.scale_factor)
    x_tr, y_tr, x_va, y_va, x_te, y_te = _split(x, y)
    mesh = make_mesh() if args.data_parallel else None
    model = EDSR(scale_factor=cfg.scale_factor,
                 num_res_blocks=cfg.num_res_blocks,
                 num_filters=cfg.num_filters, res_scaling=cfg.res_scaling)
    trainer = SupervisedSRTrainer(
        model, learning_rate=cfg.learning_rate, clipnorm=cfg.clipnorm,
        mesh=mesh, compute_dtype="bfloat16" if args.bf16 else "float32")
    res = trainer.fit(x_tr, y_tr, x_va, y_va, batch_size=cfg.batch_size,
                      epochs=cfg.epochs, es_patience=cfg.es_patience,
                      plateau_patience=cfg.plateau_patience,
                      state=_maybe_resume(args, trainer, (x_tr[:1],)),
                      **_ckpt_kwargs(args))
    ev = trainer.evaluate(res.state, x_te, y_te, batch_size=cfg.batch_size)
    print(f"Loss: {ev['loss']:.4f}, PSNR: {ev['psnr']:.2f} dB, SSIM: {ev['ssim']:.4f}")
    _save_run(args.out, f"EDSR_x{cfg.scale_factor}", res.state, res.history, ev,
              res.time_tracker, res.memory_tracker)


def cmd_train_esrgan(args):
    import jax
    import jax.numpy as jnp
    from tpusr.config import ESRGANConfig
    from tpusr.models import ESRGANGenerator, ESRGANDiscriminator, VGG19Features
    from tpusr.models.vgg import load_keras_h5_weights
    from tpusr.train import ESRGANTrainer
    from tpusr.dist import make_mesh

    # --lr sets the generator LR; the discriminator keeps the reference's
    # 10:1 G:D ratio (ESRGAN_model.py:176-195: 1e-4 / 1e-5)
    cfg = ESRGANConfig(batch_size=args.batch_size, epochs=args.epochs,
                       scale_factor=args.scale, g_lr=args.lr,
                       d_lr=args.lr * 0.1)
    x, y, _ = _load_sr_patches(args, "scale", cfg.patch_size, cfg.stride,
                               cfg.scale_factor)
    x_tr, y_tr, x_va, y_va, x_te, y_te = _split(x, y)

    gen = ESRGANGenerator(scale_factor=cfg.scale_factor,
                          growth_channels=cfg.growth_channels,
                          num_rrdb_blocks=cfg.num_rrdb_blocks)
    disc = ESRGANDiscriminator()
    vgg = VGG19Features()
    hr_patch = cfg.patch_size * cfg.scale_factor
    vgg_params = vgg.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, hr_patch, hr_patch, 3)))["params"]
    if args.vgg19_weights:
        vgg_params = load_keras_h5_weights(vgg_params, args.vgg19_weights, "vgg19")

    mesh = make_mesh() if args.data_parallel else None
    trainer = ESRGANTrainer(gen, disc, vgg, vgg_params, g_lr=cfg.g_lr,
                            d_lr=cfg.d_lr, decay_steps=cfg.decay_steps,
                            decay_rate=cfg.decay_rate, mesh=mesh,
                            compute_dtype="bfloat16" if args.bf16 else "float32")
    res = trainer.fit(x_tr, y_tr, x_va, y_va, epochs=cfg.epochs,
                      batch_size=cfg.batch_size, save_dir=args.preview_dir,
                      state=_maybe_resume(
                          args, trainer,
                          (x_tr.shape[1:], y_tr.shape[1:])),
                      **_ckpt_kwargs(args))
    ev = trainer.evaluate(res.state, x_te, y_te, batch_size=cfg.batch_size)
    print(f"PSNR: {ev['avg_psnr']:.2f}, SSIM: {ev['avg_ssim']:.4f}, "
          f"G-loss: {ev['avg_g_loss']:.2f}")
    _save_run(args.out, f"ESRGAN_x{cfg.scale_factor}", res.state,
              res.epoch_losses, ev, res.time_tracker, res.memory_tracker)


def cmd_train_vgg16(args):
    from tpusr.config import VGG16Config
    from tpusr.models import VGG16Classifier
    from tpusr.train import ClassifierTrainer
    from tpusr.data import load_defects_dataset_as_patches
    from tpusr.dist import make_mesh

    cfg = VGG16Config(batch_size=args.batch_size, epochs=args.epochs,
                      patch_size=args.patch_size, stride=args.stride)
    x, y = load_defects_dataset_as_patches(args.hr_dir,
                                           patch_size=cfg.patch_size,
                                           stride=cfg.stride,
                                           class_map_path=args.class_map)
    x_tr, y_tr, x_va, y_va, x_te, y_te = _split(x, y)
    mesh = make_mesh() if args.data_parallel else None
    pred = None
    if not cfg.base_trainable:
        pred = lambda path: path[0] != "vgg16"
    trainer = ClassifierTrainer(
        VGG16Classifier(num_classes=cfg.num_classes,
                        dropout_rate=cfg.dropout_rate,
                        dense_units=cfg.dense_units),
        learning_rate=cfg.learning_rate, mesh=mesh, trainable_predicate=pred,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    res = trainer.fit(x_tr, y_tr, x_va, y_va, batch_size=cfg.batch_size,
                      epochs=cfg.epochs,
                      state=_maybe_resume(args, trainer, (x_tr[:1],)),
                      **_ckpt_kwargs(args))
    ev = trainer.evaluate(res.state, x_te, y_te, batch_size=cfg.batch_size)
    print(f"Loss: {ev['loss']:.4f}, Accuracy: {ev['accuracy']:.4f}")
    _save_run(args.out, "VGG16", res.state, res.history, ev,
              res.time_tracker, res.memory_tracker)


def _ckpt_sidecar_metrics(ckpt_path):
    """train/val/eval metric dict from a _save_run checkpoint sidecar, in the
    plot_sr_metrics/time/memory key schema."""
    from tpusr.train.checkpoint import load_metadata

    meta = load_metadata(os.path.dirname(ckpt_path) or ".",
                         os.path.basename(ckpt_path)) or {}
    hist = meta.get("history", {})
    ev = meta.get("eval", {})
    out = {}
    for met in ("loss", "psnr", "ssim"):
        if hist.get(met):
            out[f"train_{met}"] = hist[met][-1]
        # the GAN history uses g_loss
        elif met == "loss" and hist.get("g_loss"):
            out["train_loss"] = hist["g_loss"][-1]
        if hist.get(f"val_{met}"):
            out[f"val_{met}"] = hist[f"val_{met}"][-1]
        if met in ev:
            out[f"eval_{met}"] = ev[met]
    for src, dst in (("avg_g_loss", "eval_loss"), ("avg_psnr", "eval_psnr"),
                     ("avg_ssim", "eval_ssim")):
        if src in ev:
            out[dst] = ev[src]
    times = meta.get("epoch_time_sec") or []
    if times:
        out["train_epoch_time_sec"] = float(sum(times) / len(times))
    mem = meta.get("memory") or {}
    if mem.get("gpu_mean_current_mb") is not None:
        out["train_mem_mean_mb"] = mem["gpu_mean_current_mb"]
    if mem.get("gpu_peak_mb") is not None:
        out["train_mem_peak_mb"] = mem["gpu_peak_mb"]
    return out


# classic interpolation baselines (classic_algorithms.py:7-21), on-device;
# accept the reference's method name "lanczos" for the lanczos4 kernel
_INTERP_ALIAS = {"lanczos": "lanczos4"}


def build_classic_sr_methods(names, hr_hw):
    """name -> sr_apply(lr_batch)->[0,1] HR batch, for every reference
    interpolation method name (incl. the 'lanczos' alias)."""
    import jax.numpy as jnp
    from tpusr.core.resize import resize

    return {
        name: (lambda x, n=_INTERP_ALIAS.get(name, name):
               jnp.clip(resize(x, hr_hw, n), 0.0, 1.0))
        for name in names
    }


def cmd_pipeline(args):
    """End-to-end LR -> SR (per method) -> classify comparison — the missing
    defect_detection_pipeline notebook (SURVEY §0). Wires the classic
    interpolators plus any trained SRCNN/EDSR/ESRGAN checkpoints, and emits the
    full deep_lerning_visualizations reporting surface (classification
    reports, confidence, confusion matrices, sr metrics/time/memory panels)."""
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    from tpusr.data import load_predictions_dataset
    from tpusr.core.resize import resize
    from tpusr.pipeline import run_defect_detection_comparison
    from tpusr.train.profiling import device_memory_mb
    from tpusr.viz import (plot_classification_reports_panel,
                           plot_confidence_panel, plot_confusion,
                           plot_sr_memory, plot_sr_metrics, plot_sr_time)
    from tpusr.models.api import (EDSR as EDSRFacade, ESRGAN as ESRGANFacade,
                                  FineTunedVGG16, SRCNNModel)

    x_lr, x_hr, y = load_predictions_dataset(args.lr_dir, args.hr_dir,
                                             args.class_map)
    scale = x_hr.shape[1] // x_lr.shape[1]
    hr_hw = x_hr.shape[1:3]

    vgg = FineTunedVGG16()
    vgg.setup_model(input_shape=(96, 96, 3), num_classes=2,
                    from_pretrained=bool(args.vgg16_ckpt),
                    pretrained_path=args.vgg16_ckpt)
    clf_apply = lambda p: vgg.module.apply({"params": vgg.state.params}, p)

    interp_names = [m.strip() for m in args.classic_methods.split(",") if m.strip()]
    sr_methods = build_classic_sr_methods(interp_names, hr_hw)
    sidecars = {}
    if args.srcnn_ckpt:
        srcnn = SRCNNModel()
        srcnn.setup_model(from_pretrained=True, pretrained_path=args.srcnn_ckpt)
        # SRCNN consumes a pre-upscaled input (SRCNN_model.py:111-247):
        # cv2-parity bicubic resize to HR size, then the residual net
        sr_methods["srcnn"] = lambda x: jnp.clip(
            srcnn.module.apply({"params": srcnn.state.params},
                               resize(x, hr_hw, args.srcnn_interp)), 0.0, 1.0)
        sidecars["srcnn"] = args.srcnn_ckpt
    if args.edsr_ckpt:
        edsr = EDSRFacade()
        edsr.setup_model(scale_factor=scale, from_pretrained=True,
                         pretrained_path=args.edsr_ckpt)
        sr_methods["edsr"] = lambda x: jnp.clip(
            edsr.module.apply({"params": edsr.state.params}, x), 0.0, 1.0)
        sidecars["edsr"] = args.edsr_ckpt
    if args.esrgan_ckpt:
        esr = ESRGANFacade()
        esr.setup_model(scale_factor=scale, from_trained=True,
                        generator_pretrained_path=args.esrgan_ckpt,
                        discriminator_pretrained_path=args.esrgan_disc_ckpt)
        # tanh generator works in [-1, 1] (ESRGAN_model.py:929,946)
        sr_methods["esrgan"] = lambda x: jnp.clip(
            (esr.generator.apply({"params": esr.state.g_params},
                                 x * 2.0 - 1.0) + 1.0) / 2.0, 0.0, 1.0)
        sidecars["esrgan"] = args.esrgan_ckpt

    mem_before = device_memory_mb()
    results = run_defect_detection_comparison(sr_methods, clf_apply, x_lr, x_hr,
                                              y, batch_size=args.batch_size)
    mem_after = device_memory_mb()

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "pipeline_results.json"), "w") as f:
        json.dump({k: {kk: vv for kk, vv in v.items()
                       if kk not in ("predictions", "confidences",
                                     "confusion_matrix")}
                   for k, v in results.items()}, f, indent=2, default=float)
    names = list(results)
    class_names = ["low_z_offset", "high_z_offset"]
    plot_classification_reports_panel(
        y, names, [results[n]["predictions"] for n in names],
        class_names=class_names, save_dir=args.out)
    plot_confidence_panel(y, names, [results[n]["predictions"] for n in names],
                          [results[n]["confidences"] for n in names],
                          save_dir=args.out)

    # per-method confusion-matrix grid (deep_lerning_visualizations.py:213-228)
    ncols = min(3, len(names))
    nrows = (len(names) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 4.5 * nrows),
                             squeeze=False)
    for ax in axes.ravel()[len(names):]:
        ax.axis("off")
    for ax, n in zip(axes.ravel(), names):
        plot_confusion(ax, results[n]["confusion_matrix"], class_names, n)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "confusion_matrices.png"), dpi=150,
                bbox_inches="tight")
    plt.close(fig)

    # sr metrics / time / memory panels: train-side stats from the checkpoint
    # sidecars, inference-side stats measured in this run
    metrics_per_model = {}
    for n in names:
        m = _ckpt_sidecar_metrics(sidecars[n]) if n in sidecars else {}
        m["inference_time_sec"] = results[n]["time_sec"]
        cur = (mem_before.get("current_mb"), mem_after.get("current_mb"))
        pk = (mem_before.get("peak_mb"), mem_after.get("peak_mb"))
        if all(v is not None for v in cur):
            m["inference_mem_mean_mb"] = 0.5 * (cur[0] + cur[1])
        if all(v is not None for v in pk):
            m["inference_mem_peak_mb"] = max(pk)
        metrics_per_model[n] = m
    plot_sr_metrics(names, metrics_per_model, save_dir=args.out)
    plot_sr_time(names, metrics_per_model, save_dir=args.out)
    plot_sr_memory(names, metrics_per_model, save_dir=args.out)


def cmd_convert(args):
    """Round-trip a model between the tpusr orbax checkpoint format and the
    reference's native Keras ``.h5`` artifacts (SRCNN_model.py:249-259,
    EDSR_model.py:317-330, ESRGAN_model.py:981-996, VGG16_model.py:272-281).

    Direction is inferred from ``--src``: a ``.h5``/``.hdf5`` file is
    imported and written as a tpusr checkpoint; anything else is loaded as a
    checkpoint and exported to ``.h5`` (loadable with
    ``keras.models.load_model``)."""
    from tpusr.models.api import ESRGAN, EDSR, FineTunedVGG16, SRCNNModel

    to_ckpt = args.src.endswith((".h5", ".hdf5"))
    ts = args.timestamp or _timestamp()
    if not to_ckpt and args.model == "esrgan" and args.disc:
        # checkpoint sources carry both G and D (plus the arch sidecar);
        # a user-supplied --disc would be silently ignored — refuse instead
        raise SystemExit("--disc only applies when --src is a Keras .h5 "
                         "generator; checkpoint sources already contain the "
                         "discriminator")
    if args.model == "srcnn":
        m = SRCNNModel()
        m.setup_model(from_pretrained=True, pretrained_path=args.src)
    elif args.model == "edsr":
        m = EDSR()
        m.setup_model(scale_factor=args.scale, num_res_blocks=args.blocks,
                      num_filters=args.filters, from_pretrained=True,
                      pretrained_path=args.src)
    elif args.model == "esrgan":
        m = ESRGAN()
        hw = args.patch_size
        m.setup_model(scale_factor=args.scale, growth_channels=args.growth,
                      num_rrdb_blocks=args.rrdb_blocks,
                      input_shape=(hw, hw, 3),
                      output_shape=(hw * args.scale, hw * args.scale, 3),
                      from_trained=True,
                      generator_pretrained_path=args.src,
                      discriminator_pretrained_path=args.disc)
    else:  # vgg16
        m = FineTunedVGG16()
        m.setup_model(input_shape=(args.input_hw, args.input_hw, 3),
                      num_classes=args.num_classes,
                      from_pretrained=True, pretrained_path=args.src)
    path = m.save(args.out, ts) if to_ckpt else m.save_h5(args.out, ts)
    if isinstance(path, tuple):  # ESRGAN exports generator + discriminator
        path = " + ".join(path)
    print(f"Converted {args.src} -> {path}")


def cmd_eda(args):
    from tpusr.data.eda import run_eda_pipeline

    if getattr(args, "lpips_weights", None):
        os.environ["TPUSR_LPIPS_WEIGHTS"] = args.lpips_weights
    run_eda_pipeline(args.lr_dir, args.hr_dir, args.out,
                     interp_map_path=args.interp_map, limit=args.limit)


def _gate_certification_note(args) -> str | None:
    """One-line serving-gate verdict for the selected configuration.

    Looks the configuration's gate row up in the shipped GATE artifact
    (repo-root GATE_r05.json; skipped silently when the artifact isn't
    present, e.g. an installed wheel). A mode the hard gate DEMOTED gets a
    prominent warning — the round-4 failure shape was the serve CLI
    defaulting to a configuration its own gate had failed."""
    import json

    from tpusr.tools.serving_gate import gate_row_name

    if (args.sr_mode, args.clf_mode) == ("f32", "per_patch_f32"):
        return "reference-parity path (the gate's comparison baseline)"
    try:
        row = gate_row_name(args.sr_mode, args.clf_mode,
                            border=not args.no_border,
                            cascade_score=args.cascade_score,
                            cascade_frac=args.cascade_frac,
                            cascade_guard=args.cascade_guard > 0)
    except ValueError as e:
        return f"WARNING: configuration NOT gate-certified ({e})"
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "GATE_r05.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        modes = json.load(f)["aggregate"]["modes"]
    m = next((x for x in modes if x["mode"] == row), None)
    if m is None:
        return (f"WARNING: {row} has no row in the serving gate "
                "(uncertified configuration)")
    if not m.get("passes_gate_all_seeds"):
        return (f"WARNING: {row} FAILED the hard serving gate "
                f"(min vote agreement {m['min_vote_agreement']:.4f} < 0.99, "
                f"{m['total_flips']} flips — GATE_r05.json); certified "
                "alternatives: the default cascade_int8[vote_frac+guard] "
                "or per_patch_int8 on f32 SR")
    return (f"hard-gate certified: {row} (min vote agreement "
            f"{m['min_vote_agreement']:.4f}, {m['total_flips']} flips over "
            f"seeds {m.get('seeds')} — GATE_r05.json)")


def cmd_serve(args):
    """Stand up the production serving tier: load trained EDSR + VGG16
    checkpoints, build a gated ``make_serving_pipeline`` configuration, and
    serve HTTP requests with cross-request micro-batching (PipelineServer).
    The reference has no serving surface (notebooks only) — this is the
    TPU-native deployment path; fast modes are validated at protocol scale
    by ``python -m tpusr.tools.serving_gate`` (GATE.json)."""
    import glob

    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpusr.models.api import EDSR as EDSRFacade, FineTunedVGG16
    from tpusr.pipeline import PipelineServer, make_serving_pipeline
    from tpusr.pipeline.http_serving import make_http_server

    lr_hw = (args.lr_size, args.lr_size)
    edsr = EDSRFacade()
    edsr.setup_model(scale_factor=args.scale, from_pretrained=True,
                     pretrained_path=args.edsr_ckpt)
    vgg = FineTunedVGG16()
    vgg.setup_model(input_shape=(args.patch, args.patch, 3),
                    num_classes=args.num_classes, from_pretrained=True,
                    pretrained_path=args.vgg16_ckpt)

    calib_lr = calib_patches = None
    if args.sr_mode == "int8" or args.clf_mode.endswith("int8"):
        if args.calib_dir:
            import cv2

            files = sorted(f for ext in ("png", "jpg", "jpeg")
                           for f in glob.glob(os.path.join(args.calib_dir,
                                                           f"*.{ext}")))[:16]
            if not files:
                raise SystemExit(f"--calib-dir {args.calib_dir}: no images")
            imgs = []
            for f in files:
                bgr = cv2.imread(f, cv2.IMREAD_COLOR)
                if bgr is None:
                    raise SystemExit(f"--calib-dir: unreadable image {f}")
                if bgr.shape[:2] != lr_hw:
                    bgr = cv2.resize(bgr, lr_hw[::-1],
                                     interpolation=cv2.INTER_AREA)
                imgs.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
            calib_lr = jnp.asarray(np.stack(imgs), jnp.float32) / 255.0
        else:
            print("warning: int8 mode without --calib-dir — calibrating on "
                  "random inputs (pass real LR images for tighter scales)",
                  flush=True)
            calib_lr = jnp.asarray(np.random.default_rng(0).random(
                (8, *lr_hw), dtype=np.float32)[..., None].repeat(3, -1))
        # classifier calibration patches come from the f32 SR of the same
        # calibration images — the distribution the classifier will see
        from tpusr.core.patches import patchify
        from tpusr.models.edsr_fast import make_fused_sr_apply
        from tpusr.models.layers import pixel_shuffle

        fn, r = make_fused_sr_apply(edsr.state.params, args.scale,
                                    dtype=jnp.float32)
        sr = pixel_shuffle(fn(calib_lr[:4]), r)
        pats = jax.vmap(lambda im: patchify(im, args.patch,
                                            args.stride))(sr)
        calib_patches = pats.reshape((-1, args.patch, args.patch, 3))[:64]

    pipe = make_serving_pipeline(
        edsr.state.params, vgg.state.params, lr_hw, args.scale,
        patch=args.patch, stride=args.stride, sr_mode=args.sr_mode,
        clf_mode=args.clf_mode, calib_lr=calib_lr,
        calib_patches=calib_patches,
        sr_border_correction=not args.no_border,
        cascade_escalate_frac=args.cascade_frac,
        cascade_escalate_score=args.cascade_score,
        cascade_guard_threshold=(args.cascade_guard
                                 if args.cascade_guard > 0 else None))

    config = {"sr_mode": args.sr_mode, "clf_mode": args.clf_mode,
              "scale": args.scale, "patch": args.patch,
              "stride": args.stride, "batch_size": args.batch_size,
              "max_wait_ms": args.max_wait_ms,
              "border_correction": not args.no_border}
    if args.clf_mode == "cascade_int8":
        config["cascade_escalate_frac"] = args.cascade_frac
        config["cascade_escalate_score"] = args.cascade_score
        config["cascade_guard_threshold"] = (args.cascade_guard
                                             if args.cascade_guard > 0
                                             else None)
    note = _gate_certification_note(args)
    if note:
        config["gate"] = note
        print(f"tpusr serve: {note}", flush=True)
    with PipelineServer(pipe, batch_size=args.batch_size,
                        max_wait_ms=args.max_wait_ms) as server:
        # warm the FULL serving path (jit compile + pad/coalesce + worker
        # round trip) before announcing readiness: the first real request
        # must not eat a multi-minute compile
        server.submit(np.zeros((*lr_hw, 3), np.float32)).result(timeout=900)
        httpd = make_http_server(
            server, lr_hw, config=config, host=args.host, port=args.port,
            request_timeout=args.request_timeout,
            max_requests=args.max_requests or None)
        port = httpd.server_address[1]
        if args.port_file:
            with open(args.port_file, "w") as f:
                f.write(str(port))
        print(f"tpusr serve: {args.sr_mode} SR x {args.clf_mode} on "
              f"http://{args.host}:{port} (POST /classify, /sr, "
              f"/classify_sr; GET /healthz)", flush=True)
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()


def build_parser():
    p = argparse.ArgumentParser(prog="tpusr")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("preprocess")
    sp.add_argument("--video", required=True)
    sp.add_argument("--hr-dir", required=True)
    sp.add_argument("--lr-dir", required=True)
    sp.add_argument("--skip-seconds", type=float, default=0.0)
    sp.add_argument("--frame-interval", type=float, default=1.0)
    sp.add_argument("--hr-size", type=int, default=None)
    sp.add_argument("--prefix", default="sample")
    sp.add_argument("--interp-map", default=None)
    sp.add_argument("--class-map", default=None)
    sp.add_argument("--class-id", type=int, default=None)
    sp.add_argument("--predictions", action="store_true")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--max-frames", type=int, default=None)
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("classic")
    sp.add_argument("--hr-dir", required=True)
    sp.add_argument("--lr-dir", required=True)
    sp.add_argument("--out", default="classic_algorithms_results")
    sp.add_argument("--fraction", type=float, default=0.7)
    sp.add_argument("--limit", type=int, default=None)
    sp.set_defaults(fn=cmd_classic)

    for name, fn, extra in (
        ("train-srcnn", cmd_train_srcnn, ("interp_map",)),
        ("train-edsr", cmd_train_edsr, ("scale",)),
        ("train-esrgan", cmd_train_esrgan, ("scale", "vgg19_weights", "preview_dir")),
    ):
        sp = sub.add_parser(name)
        sp.add_argument("--hr-dir", required=True)
        sp.add_argument("--lr-dir", required=True)
        sp.add_argument("--out", default="checkpoints")
        sp.add_argument("--batch-size", type=int, default=16)
        sp.add_argument("--epochs", type=int, default=50)
        sp.add_argument("--lr", type=float, default=1e-4)
        sp.add_argument("--data-parallel", action="store_true")
        sp.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (f32 master params/loss)")
        sp.add_argument("--resume", default=None,
                        help="checkpoint path: resume training incl. "
                             "optimizer state")
        sp.add_argument("--checkpoint-every", type=int, default=0,
                        help="save an async epoch_NNNN resume point under "
                             "--out every N epochs")
        if "interp_map" in extra:
            sp.add_argument("--interp-map", default=None)
        if "scale" in extra:
            sp.add_argument("--scale", type=int, default=2)
        if "vgg19_weights" in extra:
            sp.add_argument("--vgg19-weights", default=None)
        if "preview_dir" in extra:
            sp.add_argument("--preview-dir", default=None)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("train-vgg16")
    sp.add_argument("--hr-dir", required=True)
    sp.add_argument("--class-map", required=True)
    sp.add_argument("--out", default="checkpoints")
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--epochs", type=int, default=50)
    sp.add_argument("--patch-size", type=int, default=96)
    sp.add_argument("--stride", type=int, default=48)
    sp.add_argument("--data-parallel", action="store_true")
    sp.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (f32 master params/loss)")
    sp.add_argument("--resume", default=None,
                    help="checkpoint path: resume training incl. "
                         "optimizer state")
    sp.add_argument("--checkpoint-every", type=int, default=0,
                    help="save an async epoch_NNNN resume point under "
                         "--out every N epochs")
    sp.set_defaults(fn=cmd_train_vgg16)

    sp = sub.add_parser("pipeline")
    sp.add_argument("--lr-dir", required=True)
    sp.add_argument("--hr-dir", required=True)
    sp.add_argument("--class-map", required=True)
    sp.add_argument("--out", default="DL_results")
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--vgg16-ckpt", default=None)
    sp.add_argument("--srcnn-ckpt", default=None)
    sp.add_argument("--srcnn-interp", default="bicubic",
                    help="pre-upscale interpolation for the SRCNN path")
    sp.add_argument("--edsr-ckpt", default=None)
    sp.add_argument("--esrgan-ckpt", default=None)
    sp.add_argument("--esrgan-disc-ckpt", default=None,
                    help="required when --esrgan-ckpt is a Keras .h5")
    sp.add_argument("--classic-methods",
                    default="bilinear,bicubic,area,lanczos4",
                    help="comma list of classic interpolators to compare")
    sp.set_defaults(fn=cmd_pipeline)

    sp = sub.add_parser("convert")
    sp.add_argument("--model", required=True,
                    choices=("srcnn", "edsr", "esrgan", "vgg16"))
    sp.add_argument("--src", required=True,
                    help="a Keras .h5 (imports to a tpusr checkpoint) or a "
                         "tpusr checkpoint path (exports to .h5)")
    sp.add_argument("--disc", default=None,
                    help="discriminator .h5 (required for --model esrgan "
                         "when --src is a generator .h5)")
    sp.add_argument("--out", default="checkpoints")
    sp.add_argument("--timestamp", default=None,
                    help="artifact timestamp suffix (default: now)")
    sp.add_argument("--scale", type=int, default=2,
                    help="SR scale (for .h5 sources only; checkpoints carry "
                         "their architecture sidecar)")
    sp.add_argument("--blocks", type=int, default=16,
                    help="EDSR res blocks (needed for .h5 sources only; "
                         "checkpoints carry their architecture sidecar)")
    sp.add_argument("--filters", type=int, default=64)
    sp.add_argument("--growth", type=int, default=32,
                    help="ESRGAN growth channels (.h5 sources only)")
    sp.add_argument("--rrdb-blocks", type=int, default=23,
                    help="ESRGAN RRDB block count (.h5 sources only)")
    sp.add_argument("--patch-size", type=int, default=24,
                    help="ESRGAN LR train-patch size (fixes the "
                         "discriminator export geometry)")
    sp.add_argument("--input-hw", type=int, default=96,
                    help="VGG16 input H=W (the reference trains on 96x96 "
                         "patches)")
    sp.add_argument("--num-classes", type=int, default=2)
    sp.set_defaults(fn=cmd_convert)

    sp = sub.add_parser("serve", help="HTTP serving tier: micro-batched "
                        "SR + defect classification from trained checkpoints")
    sp.add_argument("--edsr-ckpt", required=True)
    sp.add_argument("--vgg16-ckpt", required=True)
    sp.add_argument("--scale", type=int, default=4)
    sp.add_argument("--lr-size", type=int, default=128,
                    help="served LR image side (compiled static shape)")
    sp.add_argument("--patch", type=int, default=96)
    sp.add_argument("--stride", type=int, default=48)
    sp.add_argument("--num-classes", type=int, default=2)
    # serve defaults = the hard-gate-certified GUARDED cascade
    # (GATE_r05.json: f32 SR + vote_frac-ranked cascade_int8 at frac 0.25
    # with the trunk-collapse guard at 0.6 — min 99.22% vote agreement on
    # all NINE hard-task seeds, 3 flips / 1152 images, no calibration
    # assumed). The guard is REQUIRED: the round-5 seed extension found a
    # draw whose unguarded trunk collapses (seed 8, agreement 0.62). The
    # same configuration is bench.py's DEFAULT_MODE;
    # tests/test_gate_consistency.py asserts both stay certified — a
    # future demotion fails tests instead of silently shipping.
    sp.add_argument("--sr-mode", default="f32",
                    choices=("f32", "bf16", "int8"))
    sp.add_argument("--clf-mode", default="cascade_int8",
                    choices=("per_patch_f32", "per_patch_int8",
                             "shared_trunk_f32", "shared_trunk_int8",
                             "cascade_int8"))
    sp.add_argument("--cascade-score", choices=("conf", "vote_frac"),
                    default="vote_frac",
                    help="cascade_int8: escalation ranking signal — patch-"
                         "agreement fraction (certified) or trunk vote "
                         "confidence (GATE_r05.json cascade_rank_analysis)")
    sp.add_argument("--cascade-frac", type=float, default=0.25,
                    help="cascade_int8: fraction of each batch (the lowest-"
                         "scored trunk votes) escalated to the exact "
                         "per-patch int8 path (GATE_r05.json cascade rows; "
                         "0.25 is the certified minimum with the guard, "
                         "0.3125 the strictest tier: 1 flip / 1152)")
    sp.add_argument("--cascade-guard", type=float, default=0.6,
                    help="cascade_int8: trunk-collapse guard threshold — "
                         "if the escalated subset's trunk-vs-per-patch "
                         "disagreement reaches it, the whole batch is "
                         "re-served per-patch (0 disables; 0.6 certified, "
                         "REQUIRED for the 9-seed GATE_r05.json pass)")
    sp.add_argument("--no-border", action="store_true",
                    help="drop the int8 SR border band (classify-only mode: "
                         "fastest, SR output not image-faithful — see "
                         "GATE.json)")
    sp.add_argument("--calib-dir", default=None,
                    help="directory of LR images for int8 calibration")
    sp.add_argument("--batch-size", type=int, default=16)
    sp.add_argument("--max-wait-ms", type=float, default=5.0)
    sp.add_argument("--request-timeout", type=float, default=120.0,
                    help="per-request wait on the batcher future (seconds)")
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8512,
                    help="0 picks a free port (printed + --port-file)")
    sp.add_argument("--port-file", default=None,
                    help="write the bound port here once listening")
    sp.add_argument("--max-requests", type=int, default=0,
                    help="shut down after N POSTs (0 = serve forever; "
                         "smoke/CI use)")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("eda")
    sp.add_argument("--hr-dir", required=True)
    sp.add_argument("--lr-dir", required=True)
    sp.add_argument("--out", default="eda_results")
    sp.add_argument("--interp-map", default=None)
    sp.add_argument("--limit", type=int, default=None)
    sp.add_argument("--lpips-weights", default=None,
                    help="provisioned lpips_alex .npz "
                         "(tpusr.tools.lpips_weights); activates the LPIPS "
                         "column + best/worst-LPIPS scenario dumps")
    sp.set_defaults(fn=cmd_eda)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

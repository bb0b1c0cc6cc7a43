"""End-to-end smoke tests for the CLI entry points and the EDA pipeline on a
tiny synthetic dataset — the notebook-replacement layer (L6)."""

import json
import os
import pickle

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # CLI end-to-end drives (several minutes)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    hr_dir, lr_dir = root / "HR", root / "LR"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    imap, cmap = {}, {}
    for i in range(4):
        hr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        hr = cv2.GaussianBlur(hr, (3, 3), 1.0)
        lr = cv2.resize(hr, (24, 24), interpolation=cv2.INTER_AREA)
        name = f"s_{i:03d}.png"
        cv2.imwrite(str(hr_dir / name), hr)
        cv2.imwrite(str(lr_dir / name), lr)
        imap[name] = "INTER_CUBIC"
        cmap[name] = i % 2
    with open(root / "imap.pkl", "wb") as f:
        pickle.dump(imap, f)
    with open(root / "cmap.pkl", "wb") as f:
        pickle.dump(cmap, f)
    return root


def test_cli_classic(tiny_dataset, tmp_path):
    from tpusr.cli.__main__ import main
    out = tmp_path / "classic_out"
    main(["classic", "--hr-dir", str(tiny_dataset / "HR"),
          "--lr-dir", str(tiny_dataset / "LR"), "--out", str(out),
          "--fraction", "1.0", "--limit", "2"])
    data = json.load(open(out / "classic_summary.json"))
    assert len(data["ranked"]) == 8
    assert (out / "psnr_ssim_summary.png").exists()
    assert (out / "algorithm_ranking.png").exists()


def test_cli_train_srcnn(tiny_dataset, tmp_path):
    from tpusr.cli.__main__ import main
    out = tmp_path / "ckpt"
    main(["train-srcnn", "--hr-dir", str(tiny_dataset / "HR"),
          "--lr-dir", str(tiny_dataset / "LR"),
          "--interp-map", str(tiny_dataset / "imap.pkl"),
          "--out", str(out), "--epochs", "1", "--batch-size", "8"])
    metas = [f for f in os.listdir(out) if f.endswith(".meta.json")]
    assert len(metas) == 1
    meta = json.load(open(out / metas[0]))
    assert "psnr" in meta["eval"] and "hr_h" in meta["eval"]
    # observability: per-epoch JSONL + CSV land next to the checkpoint
    from tpusr.train.logging import read_jsonl
    jls = [f for f in os.listdir(out) if f.endswith(".metrics.jsonl")]
    assert len(jls) == 1
    recs = read_jsonl(str(out / jls[0]), scope="epoch")
    assert len(recs) == 1 and "loss" in recs[0]
    assert any(f.endswith(".metrics.csv") for f in os.listdir(out))


def test_cli_train_vgg16(tiny_dataset, tmp_path):
    from tpusr.cli.__main__ import main
    out = tmp_path / "ckpt"
    main(["train-vgg16", "--hr-dir", str(tiny_dataset / "HR"),
          "--class-map", str(tiny_dataset / "cmap.pkl"),
          "--out", str(out), "--epochs", "1", "--batch-size", "8",
          "--patch-size", "32", "--stride", "16"])
    metas = [f for f in os.listdir(out) if f.endswith(".meta.json")]
    assert json.load(open(out / metas[0]))["eval"]["accuracy"] >= 0.0


def test_cli_pipeline(tiny_dataset, tmp_path):
    from tpusr.cli.__main__ import main
    out = tmp_path / "dl"
    main(["pipeline", "--lr-dir", str(tiny_dataset / "LR"),
          "--hr-dir", str(tiny_dataset / "HR"),
          "--class-map", str(tiny_dataset / "cmap.pkl"),
          "--out", str(out), "--batch-size", "2"])
    res = json.load(open(out / "pipeline_results.json"))
    # all four classic interpolators compared by default
    for method in ("bilinear", "bicubic", "area", "lanczos4"):
        assert method in res, method
        assert 0.0 <= res[method]["accuracy"] <= 1.0
        assert res[method]["psnr_mean"] > 5.0
    assert (out / "cls_report_summary.png").exists()
    assert (out / "sr_confidence_panel.png").exists()
    # full reporting surface (deep_lerning_visualizations parity)
    assert (out / "confusion_matrices.png").exists()
    assert (out / "sr_metrics_panel.png").exists()
    assert (out / "sr_time_panel.png").exists()
    assert (out / "sr_memory_panel.png").exists()


def test_eda_pipeline(tiny_dataset, tmp_path):
    from tpusr.data.eda import run_eda_pipeline
    out = tmp_path / "eda"
    df = run_eda_pipeline(str(tiny_dataset / "LR"), str(tiny_dataset / "HR"),
                          str(out), interp_map_path=str(tiny_dataset / "imap.pkl"))
    assert len(df) == 4
    for col in ("psnr", "ssim", "glcm_contrast", "rms_noise_lr", "blocking_hr",
                "ringing_lr", "edge_diff", "ch0_skew_lr"):
        assert col in df.columns
        assert df[col].notna().all(), col
    for png in ("advanced_global_panel.png", "distributions.png",
                "artifact_boxplots.png", "correlation_matrix.png",
                "scatter_relations.png", "artifact_color_histograms.png",
                "channel_shape_bars.png"):
        assert (out / png).exists(), png
    assert (out / "eda_metrics.csv").exists()
    assert len(list((out / "LPIPS_Scenarios").rglob("*.png"))) >= 4


def test_lpips_provisioning_rehearsal(tiny_dataset, tmp_path, monkeypatch):
    """Full provisioning path rehearsal BEFORE real weight files exist:
    synthesize torch .pth checkpoints with the official layouts, run the
    actual `python -m tpusr.tools.lpips_weights` CLI, then drive
    `tpusr eda --lpips-weights` through the activated LPIPS column
    (EDA.ipynb cells 1/5/10)."""
    import subprocess
    import sys

    import torch

    from tpusr.metrics.lpips import ALEX_CONVS

    rng = np.random.default_rng(3)
    # torchvision AlexNet-OWT layout: .features.{0,3,6,8,10}.{weight,bias},
    # OIHW kernels
    alex_sd, in_ch = {}, 3
    for idx, (k, _s, _p, out_ch) in zip((0, 3, 6, 8, 10), ALEX_CONVS):
        alex_sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (out_ch, in_ch, k, k)).astype(np.float32))
        alex_sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.01, (out_ch,)).astype(np.float32))
        in_ch = out_ch
    # lpips v0.1 linear-head layout: lin{i}.model.1.weight, (1, C, 1, 1)
    lin_sd = {
        f"lin{i}.model.1.weight": torch.tensor(
            rng.random((1, c, 1, 1)).astype(np.float32))
        for i, (_k, _s, _p, c) in enumerate(ALEX_CONVS)
    }
    alex_pth = tmp_path / "alexnet-owt-synth.pth"
    lin_pth = tmp_path / "alex-linear-synth.pth"
    torch.save(alex_sd, str(alex_pth))
    torch.save(lin_sd, str(lin_pth))

    npz = tmp_path / "w" / "lpips_alex.npz"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [sys.executable, "-m", "tpusr.tools.lpips_weights",
         "--alexnet", str(alex_pth), "--linear", str(lin_pth),
         "--out", str(npz)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    assert npz.exists() and "validated" in res.stdout

    # the converted bundle passes the strict shape validation
    from tpusr.tools.lpips_weights import validate
    validate(dict(np.load(str(npz)).items()))

    # drive the EDA CLI through the now-active LPIPS column; clear the
    # module-level lazy cache so this test is order-independent
    import tpusr.data.eda as eda_mod
    monkeypatch.setattr(eda_mod, "_LPIPS_JAX_W", None)
    monkeypatch.delenv("TPUSR_LPIPS_WEIGHTS", raising=False)
    from tpusr.cli.__main__ import main
    out = tmp_path / "eda"
    main(["eda", "--lr-dir", str(tiny_dataset / "LR"),
          "--hr-dir", str(tiny_dataset / "HR"), "--out", str(out),
          "--lpips-weights", str(npz)])
    import pandas as pd
    df = pd.read_csv(out / "eda_metrics.csv")
    assert "lpips" in df.columns and df["lpips"].notna().all()
    assert df["lpips"].std() > 0  # real per-pair values, not a constant
    # best/worst scenario dumps keyed by LPIPS now exist
    assert len(list((out / "LPIPS_Scenarios").rglob("*.png"))) >= 4
    monkeypatch.setattr(eda_mod, "_LPIPS_JAX_W", None)


def test_glcm_features_properties():
    """GLCM sanity: uniform image -> contrast 0, homogeneity 1."""
    from tpusr.data.eda import glcm_features
    flat = np.full((32, 32), 128, np.uint8)
    g = glcm_features(flat, levels=64)
    assert g["glcm_contrast"] == 0.0
    assert abs(g["glcm_homogeneity"] - 1.0) < 1e-9
    # high-contrast checkerboard -> large contrast, low homogeneity
    cb = (np.indices((32, 32)).sum(0) % 2 * 255).astype(np.uint8)
    g2 = glcm_features(cb, levels=64)
    assert g2["glcm_contrast"] > 100
    assert g2["glcm_homogeneity"] < 0.2


def test_cli_pipeline_with_checkpoints(tiny_dataset, tmp_path):
    """All four deep-model flags (--vgg16/srcnn/edsr/esrgan-ckpt) must load
    and run; SRCNN pre-upscales, ESRGAN maps through [-1,1]."""
    from tpusr.cli.__main__ import main
    from tpusr.models.api import (EDSR as EDSRFacade, ESRGAN as ESRGANFacade,
                                  FineTunedVGG16, SRCNNModel)

    # train-and-save tiny models via the facades
    edsr = EDSRFacade()
    edsr.setup_model(scale_factor=2, num_res_blocks=1)
    edsr.trained = True
    edsr_path = edsr.save(str(tmp_path / "ck"), "t")

    srcnn = SRCNNModel()
    srcnn.setup_model()
    srcnn._trained = True
    srcnn_path = srcnn.save(str(tmp_path / "ck"), "t")

    esr = ESRGANFacade()
    esr.setup_model(scale_factor=2, growth_channels=4, num_rrdb_blocks=1,
                    input_shape=(24, 24, 3), output_shape=(48, 48, 3))
    esr.trained = True
    esr_path = esr.save(str(tmp_path / "ck"), "t")

    vgg = FineTunedVGG16()
    vgg.setup_model(input_shape=(96, 96, 3), num_classes=2)
    vgg.trained = True
    vgg_path = vgg.save(str(tmp_path / "ck"), "t")

    out = tmp_path / "dl"
    main(["pipeline", "--lr-dir", str(tiny_dataset / "LR"),
          "--hr-dir", str(tiny_dataset / "HR"),
          "--class-map", str(tiny_dataset / "cmap.pkl"),
          "--out", str(out), "--batch-size", "2",
          "--classic-methods", "bicubic,lanczos",
          "--vgg16-ckpt", vgg_path, "--srcnn-ckpt", srcnn_path,
          "--edsr-ckpt", edsr_path, "--esrgan-ckpt", esr_path])
    import json
    res = json.load(open(out / "pipeline_results.json"))
    # "lanczos" is the reference's name for the lanczos4 kernel — the CLI
    # must alias it (regression: it crashed mid-run before round 2)
    for method in ("bicubic", "lanczos", "srcnn", "edsr", "esrgan"):
        assert method in res, method
        assert "psnr_mean" in res[method]
    assert (out / "sr_metrics_panel.png").exists()

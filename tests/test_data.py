"""Loader-parity tests: build a tiny synthetic dataset on disk and compare
against straightforward re-statements of the reference's loader loops
(loading_methods.py:40-191, 194-285, 288-386)."""

import os
import pickle

import cv2
import numpy as np
import pytest

from tpusr.data import (
    load_dataset_as_patches, load_defects_dataset_as_patches,
    load_predictions_dataset, add_padding, degrade_image,
)


@pytest.fixture(scope="module")
def dataset_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    hr_dir, lr_dir = root / "HR", root / "LR"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    interp_map, class_map = {}, {}
    for i in range(3):
        hr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        lr = cv2.resize(hr, (32, 32), interpolation=cv2.INTER_AREA)
        name = f"img_{i:03d}.png"
        cv2.imwrite(str(hr_dir / name), cv2.cvtColor(hr, cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(lr_dir / name), cv2.cvtColor(lr, cv2.COLOR_RGB2BGR))
        interp_map[name] = ["INTER_LINEAR", "INTER_CUBIC", "INTER_LANCZOS4"][i]
        class_map[name] = i % 2
    imap_path = str(root / "interpolation_map.pkl")
    cmap_path = str(root / "class_labels_map.pkl")
    with open(imap_path, "wb") as f:
        pickle.dump(interp_map, f)
    with open(cmap_path, "wb") as f:
        pickle.dump(class_map, f)
    return str(hr_dir), str(lr_dir), imap_path, cmap_path, interp_map


def _ref_srcnn_loader(hr_dir, lr_dir, patch, stride, interp_map):
    """Reference loading_methods.py:115-161, srcnn mode, restated."""
    name_to_code = {"INTER_LINEAR": cv2.INTER_LINEAR, "INTER_CUBIC": cv2.INTER_CUBIC,
                    "INTER_AREA": cv2.INTER_AREA, "INTER_LANCZOS4": cv2.INTER_LANCZOS4}
    X, Y = [], []
    for fname in sorted(os.listdir(hr_dir)):
        hr = cv2.cvtColor(cv2.imread(os.path.join(hr_dir, fname)),
                          cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        lr = cv2.cvtColor(cv2.imread(os.path.join(lr_dir, fname)),
                          cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        hr_h, hr_w = hr.shape[:2]
        code = name_to_code[interp_map[fname]]
        lr_up = np.clip(cv2.resize(lr, (hr_w, hr_h), interpolation=code), 0, 1)
        hr_p = add_padding(hr, patch, stride)
        lr_p = add_padding(lr_up, patch, stride)
        H, W = hr_p.shape[:2]
        for i in range(0, H - patch + 1, stride):
            for j in range(0, W - patch + 1, stride):
                Y.append(hr_p[i:i + patch, j:j + patch])
                X.append(lr_p[i:i + patch, j:j + patch])
    return np.array(X), np.array(Y)


def test_srcnn_loader_parity(dataset_dirs):
    hr_dir, lr_dir, imap, cmap, interp_map = dataset_dirs
    X, Y, hr_h, hr_w = load_dataset_as_patches(
        hr_dir, lr_dir, mode="srcnn", patch_size=24, stride=12,
        interpolation_map_path=imap)
    wX, wY = _ref_srcnn_loader(hr_dir, lr_dir, 24, 12, interp_map)
    assert X.shape == wX.shape and Y.shape == wY.shape
    np.testing.assert_array_equal(Y, wY)
    np.testing.assert_array_equal(X, wX)
    assert (hr_h, hr_w) == (64, 64)


def test_scale_loader_alignment(dataset_dirs):
    hr_dir, lr_dir, *_ = dataset_dirs
    X, Y = load_dataset_as_patches(hr_dir, lr_dir, mode="scale", patch_size=24,
                                   stride=12, scale_factor=2)
    assert X.shape[1:] == (24, 24, 3)
    assert Y.shape[1:] == (48, 48, 3)
    assert X.shape[0] == Y.shape[0] > 0


def test_defects_loader_quirk(dataset_dirs):
    """Reference iterates UN-padded dims (loading_methods.py:275-277):
    64x64 image, patch 24, stride 12 -> range(0, 41, 12) = 4 positions/axis."""
    hr_dir, _, _, cmap, _ = dataset_dirs
    X, y = load_defects_dataset_as_patches(hr_dir, patch_size=24, stride=12,
                                           class_map_path=cmap)
    assert X.shape[0] == 3 * 4 * 4
    assert set(np.unique(y)) <= {0, 1}
    # padded iteration (the SR loader's convention) gives 5 positions/axis
    Xp, _ = load_defects_dataset_as_patches(hr_dir, patch_size=24, stride=12,
                                            class_map_path=cmap,
                                            iterate_padded=True)
    assert Xp.shape[0] == 3 * 5 * 5


def test_predictions_loader(dataset_dirs):
    hr_dir, lr_dir, _, cmap, _ = dataset_dirs
    x_lr, x_hr, y = load_predictions_dataset(lr_dir, hr_dir, cmap)
    assert x_lr.shape == (3, 32, 32, 3)
    assert x_hr.shape == (3, 64, 64, 3)
    assert y.tolist() == [0, 1, 0]
    assert x_lr.dtype == np.float32 and 0.0 <= x_lr.min() and x_lr.max() <= 1.0


def test_loader_validation_errors(dataset_dirs, tmp_path):
    hr_dir, lr_dir, imap, cmap, _ = dataset_dirs
    with pytest.raises(ValueError):
        load_dataset_as_patches(hr_dir, lr_dir, mode="bogus")
    with pytest.raises(ValueError):
        load_dataset_as_patches("/nonexistent", lr_dir)
    with pytest.raises(ValueError):
        load_dataset_as_patches(hr_dir, lr_dir, patch_size=-1)
    with pytest.raises(FileNotFoundError):
        load_defects_dataset_as_patches(hr_dir, class_map_path="/nope.pkl")
    with pytest.raises(ValueError):
        load_predictions_dataset(str(tmp_path), hr_dir, cmap)  # empty dir


def test_degrade_image_shapes_and_determinism():
    import jax
    rng = np.random.default_rng(11)
    hr = rng.random((64, 64, 3)).astype(np.float32)
    lr1, name1 = degrade_image(hr, key=jax.random.PRNGKey(3), apply_jpeg=False)
    lr2, name2 = degrade_image(hr, key=jax.random.PRNGKey(3), apply_jpeg=False)
    assert lr1.shape == (32, 32, 3)
    assert name1 == name2
    np.testing.assert_array_equal(lr1, lr2)  # deterministic given the key
    assert name1 in ("INTER_LINEAR", "INTER_CUBIC", "INTER_AREA", "INTER_LANCZOS4")
    lr3, _ = degrade_image(hr, key=jax.random.PRNGKey(4), apply_jpeg=True)
    assert lr3.shape == (32, 32, 3)
    assert 0.0 <= lr3.min() and lr3.max() <= 1.0
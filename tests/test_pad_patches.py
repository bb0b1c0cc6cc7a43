"""Parity tests for reflect padding, patchify, and overlap-add reconstruction
against straightforward numpy re-statements of the reference's loops
(loading_methods.py:6-26, SRCNN_model.py:149-188)."""

import numpy as np
import pytest

from tpusr.core.pad import pad_amounts, reflect_pad
from tpusr.core.patches import patch_grid_size, patchify, overlap_add


def ref_add_padding(image, patch_size, stride):
    h, w, _ = image.shape
    pad_h = (patch_size - (h % stride)) % stride if h % stride != 0 else 0
    pad_w = (patch_size - (w % stride)) % stride if w % stride != 0 else 0
    pad_h = max(pad_h, patch_size - stride)
    pad_w = max(pad_w, patch_size - stride)
    return np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")


def ref_extract_patches(image, patch_size, stride):
    h, w, _ = image.shape
    patches = []
    positions = []
    for i in range(0, h - patch_size + 1, stride):
        for j in range(0, w - patch_size + 1, stride):
            patches.append(image[i : i + patch_size, j : j + patch_size, :])
            positions.append((i, j))
    return np.array(patches), positions


def ref_reconstruct(patches, positions, padded_shape, original_shape, patch_size):
    h_pad, w_pad = padded_shape[:2]
    h_orig, w_orig = original_shape
    recon = np.zeros((h_pad, w_pad, 3), dtype=np.float32)
    weight = np.zeros((h_pad, w_pad, 3), dtype=np.float32)
    for patch, (i, j) in zip(patches, positions):
        recon[i : i + patch_size, j : j + patch_size, :] += patch
        weight[i : i + patch_size, j : j + patch_size, :] += 1.0
    recon = np.divide(recon, weight, out=np.zeros_like(recon), where=weight != 0)
    return recon[:h_orig, :w_orig, :]


@pytest.mark.parametrize("hw,patch,stride", [((100, 130), 24, 12), ((96, 96), 24, 12),
                                             ((50, 77), 96, 48), ((33, 41), 24, 12)])
def test_reflect_pad_matches_reference(hw, patch, stride, rng):
    img = rng.random((*hw, 3), dtype=np.float32)
    want = ref_add_padding(img, patch, stride)
    got = np.asarray(reflect_pad(img, patch, stride))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    assert pad_amounts(hw[0], hw[1], patch, stride) == (
        want.shape[0] - hw[0], want.shape[1] - hw[1])


@pytest.mark.parametrize("hw,patch,stride", [((72, 96), 24, 12), ((48, 48), 24, 12),
                                             ((144, 192), 96, 48)])
def test_patchify_matches_reference_order(hw, patch, stride, rng):
    img = rng.random((*hw, 3), dtype=np.float32)
    want, positions = ref_extract_patches(img, patch, stride)
    got = np.asarray(patchify(img, patch, stride))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("hw,patch,stride", [((100, 130), 24, 12), ((67, 41), 24, 12)])
def test_roundtrip_pad_patch_reconstruct(hw, patch, stride, rng):
    """pad -> patchify -> overlap_add must reproduce the reference pipeline and,
    being an average of exact copies, the original image."""
    img = rng.random((*hw, 3), dtype=np.float32)
    padded = np.asarray(reflect_pad(img, patch, stride))
    patches = np.asarray(patchify(padded, patch, stride))
    _, positions = ref_extract_patches(padded, patch, stride)

    want = ref_reconstruct(patches, positions, padded.shape, hw, patch)
    nh, nw = patch_grid_size(padded.shape[0], padded.shape[1], patch, stride)
    got = np.asarray(overlap_add(patches, (nh, nw), stride, crop_hw=hw))

    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_overlap_add_nondivisible_stride(rng):
    """Fallback scan path: patch=33, stride=14 (the reference's defaults)."""
    patch, stride = 33, 14
    img = rng.random((80, 94, 3), dtype=np.float32)
    padded = np.asarray(reflect_pad(img, patch, stride))
    patches = np.asarray(patchify(padded, patch, stride))
    _, positions = ref_extract_patches(padded, patch, stride)
    want = ref_reconstruct(patches, positions, padded.shape, (80, 94), patch)
    nh, nw = patch_grid_size(padded.shape[0], padded.shape[1], patch, stride)
    got = np.asarray(overlap_add(patches, (nh, nw), stride, crop_hw=(80, 94)))
    np.testing.assert_allclose(got, want, atol=1e-6)

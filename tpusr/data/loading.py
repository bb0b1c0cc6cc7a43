"""Host-side dataset builders with reference-exact semantics.

Parity targets in ``SRModels/loading_methods.py``:
- add_padding (:6-26)
- get_all_image_paths (:28-38)
- load_dataset_as_patches (:40-191) — modes 'srcnn' (pre-upscaled LR, iterate
  padded dims) and 'scale' (LR patch p, HR patch p*scale at (i*s, j*s))
- load_defects_dataset_as_patches (:194-285) — NOTE: the reference pads via
  add_padding but iterates the **un-padded** hr_h/hr_w (:275-277), unlike the
  SR loader which iterates padded dims (:154-156). That behavioral quirk is
  preserved here (flag `iterate_padded=False` default matches the reference).
- load_predictions_dataset (:288-386)

Image decode stays on the host (cv2); patch extraction happens as one
vectorized numpy view op per image (stride tricks) instead of the reference's
pure-python double loop — same outputs, ~100x faster host path. Device-side
patching lives in tpusr.core.patches for the on-device pipelines.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in this environment
    cv2 = None

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tiff")

def add_padding(image: np.ndarray, patch_size: int, stride: int) -> np.ndarray:
    """loading_methods.py:6-26 parity (host numpy version)."""
    h, w = image.shape[:2]
    pad_h = (patch_size - (h % stride)) % stride if h % stride != 0 else 0
    pad_w = (patch_size - (w % stride)) % stride if w % stride != 0 else 0
    pad_h = max(pad_h, patch_size - stride)
    pad_w = max(pad_w, patch_size - stride)
    return np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")


def get_all_image_paths(root: str) -> list[str]:
    """loading_methods.py:28-38 parity."""
    paths = []
    for dirpath, _, filenames in os.walk(root):
        for fn in filenames:
            if fn.lower().endswith(_IMG_EXTS):
                paths.append(os.path.join(dirpath, fn))
    return sorted(paths)


def _imread_rgb01(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError(f"Failed to read image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def _sliding_patches(img: np.ndarray, patch: int, stride: int,
                     limit_hw: tuple[int, int] | None = None) -> np.ndarray:
    """All patches at (i*stride, j*stride) with i,j bounded by limit_hw (or the
    image itself). Vectorized equivalent of the reference's double loop."""
    h, w = img.shape[:2]
    lim_h, lim_w = limit_hw if limit_hw is not None else (h, w)
    nh = max(0, (lim_h - patch) // stride + 1)
    nw = max(0, (lim_w - patch) // stride + 1)
    if nh == 0 or nw == 0:
        return np.empty((0, patch, patch, img.shape[2]), img.dtype)
    s0, s1, s2 = img.strides
    view = np.lib.stride_tricks.as_strided(
        img, shape=(nh, nw, patch, patch, img.shape[2]),
        strides=(s0 * stride, s1 * stride, s0, s1, s2), writeable=False)
    return view.reshape(nh * nw, patch, patch, img.shape[2]).copy()


def resolve_cv2_interp(value) -> int:
    """Map an interpolation_map entry to a cv2 flag for host resizing. The
    reference passes int map codes straight to cv2.resize — unrecognized ints
    (e.g. cv2.INTER_NEAREST == 0) pass through unchanged rather than silently
    becoming bicubic."""
    names = {"INTER_LINEAR": cv2.INTER_LINEAR, "INTER_CUBIC": cv2.INTER_CUBIC,
             "INTER_AREA": cv2.INTER_AREA, "INTER_LANCZOS4": cv2.INTER_LANCZOS4,
             "INTER_NEAREST": cv2.INTER_NEAREST}
    if isinstance(value, str):
        return names.get(value, cv2.INTER_CUBIC)
    if isinstance(value, (int, np.integer)):
        return int(value)
    return cv2.INTER_CUBIC


def load_dataset_as_patches(hr_root, lr_root, mode="srcnn", patch_size=33,
                            stride=14, scale_factor=2,
                            interpolation_map_path=None):
    """loading_methods.py:40-191 parity. Returns (X, Y) or (X, Y, hr_h, hr_w)."""
    if mode not in ("srcnn", "scale"):
        raise ValueError("mode must be 'srcnn' or 'scale'")
    if not os.path.exists(hr_root) or not os.path.exists(lr_root):
        raise ValueError("Both HR and LR root directories must exist.")
    if not os.path.isdir(hr_root) or not os.path.isdir(lr_root):
        raise ValueError("Both HR and LR root paths must be directories.")
    if not isinstance(patch_size, int) or patch_size <= 0:
        raise ValueError("patch_size must be positive int.")
    if not isinstance(stride, int) or stride <= 0:
        raise ValueError("stride must be positive int.")
    if mode == "scale" and (not isinstance(scale_factor, int) or scale_factor <= 0):
        raise ValueError("scale_factor must be positive int.")

    hr_paths = get_all_image_paths(hr_root)
    lr_paths = get_all_image_paths(lr_root)
    if not hr_paths or not lr_paths:
        raise ValueError("No images found in provided directories.")
    hr_dict = {os.path.basename(p): p for p in hr_paths}
    lr_dict = {os.path.basename(p): p for p in lr_paths}
    common = sorted(set(hr_dict) & set(lr_dict))
    if not common:
        raise ValueError(
            "No matching basenames found between HR and LR roots (pairs are "
            "matched by filename, like the predictions loader).")

    interpolation_map = None
    if mode == "srcnn" and interpolation_map_path is not None:
        with open(interpolation_map_path, "rb") as f:
            interpolation_map = pickle.load(f)

    xs, ys = [], []
    hr_h = hr_w = None
    for fname in common:
        hr_img = _imread_rgb01(hr_dict[fname])
        lr_img = _imread_rgb01(lr_dict[fname])
        hr_h, hr_w = hr_img.shape[:2]

        if mode == "srcnn":
            flag = cv2.INTER_CUBIC
            if interpolation_map is not None:
                # any cv2 code in the map goes straight to cv2.resize
                # (reference loading_methods.py passes codes through verbatim)
                flag = resolve_cv2_interp(
                    interpolation_map.get(fname, "INTER_CUBIC"))
            lr_up = cv2.resize(lr_img, (hr_w, hr_h), interpolation=flag)
            lr_up = np.clip(lr_up, 0.0, 1.0)
            hr_proc = add_padding(hr_img, patch_size, stride)
            lr_proc = add_padding(lr_up, patch_size, stride)
            # iterate over padded dims (reference :154-156)
            xs.append(_sliding_patches(lr_proc, patch_size, stride))
            ys.append(_sliding_patches(hr_proc, patch_size, stride))
        else:
            p_hr = patch_size * scale_factor
            hr_proc = add_padding(hr_img, p_hr, stride)
            lr_proc = add_padding(lr_img, patch_size, stride)
            lr_p = _sliding_patches(lr_proc, patch_size, stride)
            # HR patches at (i*scale, j*scale) with i,j from the LR grid;
            # the reference's shape guard (:180-184) is implicit here because
            # padding guarantees in-bounds HR windows for every LR window.
            lrH, lrW = lr_proc.shape[:2]
            nh = (lrH - patch_size) // stride + 1
            nw = (lrW - patch_size) // stride + 1
            hr_list = []
            keep = []
            for k in range(nh * nw):
                i, j = divmod(k, nw)
                hi, hj = i * stride * scale_factor, j * stride * scale_factor
                hp = hr_proc[hi:hi + p_hr, hj:hj + p_hr]
                if hp.shape[:2] == (p_hr, p_hr):
                    hr_list.append(hp)
                    keep.append(k)
            xs.append(lr_p[keep])
            ys.append(np.stack(hr_list) if hr_list else
                      np.empty((0, p_hr, p_hr, 3), np.float32))

    x_arr = np.concatenate(xs) if xs else np.empty((0,))
    y_arr = np.concatenate(ys) if ys else np.empty((0,))
    if mode == "srcnn":
        return x_arr, y_arr, hr_h, hr_w
    return x_arr, y_arr


def load_defects_dataset_as_patches(hr_root, patch_size=33, stride=14,
                                    class_map_path=None, iterate_padded=False):
    """loading_methods.py:194-285 parity. By default reproduces the reference's
    quirk of iterating the UN-padded image dims (:275-277)."""
    if not os.path.exists(hr_root):
        raise ValueError("HR root directory must exist.")
    if not os.path.isdir(hr_root):
        raise ValueError("HR root path must be a directory.")
    if not isinstance(patch_size, int) or patch_size <= 0:
        raise ValueError("patch_size must be positive int.")
    if not isinstance(stride, int) or stride <= 0:
        raise ValueError("stride must be positive int.")
    if not class_map_path or not isinstance(class_map_path, str):
        raise ValueError("class_map_path must be a non-empty string.")
    if not os.path.exists(class_map_path):
        raise FileNotFoundError(f"Class labels map not found: {class_map_path}")

    hr_paths = get_all_image_paths(hr_root)
    if not hr_paths:
        raise ValueError("No images found under HR root directory.")
    with open(class_map_path, "rb") as f:
        class_labels_map = pickle.load(f)
    if not isinstance(class_labels_map, dict):
        raise ValueError("class_labels_map pickle must contain a dict of "
                         "{basename: class_id}.")
    hr_paths = sorted(hr_paths, key=os.path.basename)

    xs, ys = [], []
    for path in hr_paths:
        img = _imread_rgb01(path)
        hr_h, hr_w = img.shape[:2]
        base = os.path.basename(path)
        if base not in class_labels_map:
            raise KeyError(f"Missing class id for image basename in "
                           f"class_labels_map: {base}")
        class_id = int(class_labels_map[base])
        proc = add_padding(img, patch_size, stride)
        limit = None if iterate_padded else (hr_h, hr_w)
        patches = _sliding_patches(proc, patch_size, stride, limit_hw=limit)
        xs.append(patches)
        ys.append(np.full((patches.shape[0],), class_id, np.int64))
    return (np.concatenate(xs).astype(np.float32),
            np.concatenate(ys))


def load_predictions_dataset(lr_root: str, hr_root: str, class_map_path: str):
    """loading_methods.py:288-386 parity: full aligned LR/HR pairs + labels."""
    for root, nm in ((lr_root, "lr_root"), (hr_root, "hr_root")):
        if not root or not isinstance(root, str) or not os.path.exists(root):
            raise ValueError(f"{nm} must be an existing directory path.")
        if not os.path.isdir(root):
            raise ValueError(f"{nm} must be a directory.")
    if not class_map_path or not isinstance(class_map_path, str):
        raise ValueError("class_map_path must be a non-empty string.")
    if not os.path.exists(class_map_path):
        raise FileNotFoundError(f"Class labels map not found: {class_map_path}")

    lr_paths = get_all_image_paths(lr_root)
    hr_paths = get_all_image_paths(hr_root)
    if not lr_paths:
        raise ValueError("No images found under LR root directory.")
    if not hr_paths:
        raise ValueError("No images found under HR root directory.")
    with open(class_map_path, "rb") as f:
        class_labels_map = pickle.load(f)
    if not isinstance(class_labels_map, dict):
        raise ValueError("class_labels_map pickle must contain a dict of "
                         "{basename: class_id}.")
    lr_dict = {os.path.basename(p): p for p in lr_paths}
    hr_dict = {os.path.basename(p): p for p in hr_paths}
    common = sorted(set(lr_dict) & set(hr_dict))
    if not common:
        raise ValueError("No matching basenames found between LR and HR roots.")

    x_lr, x_hr, y = [], [], []
    for base in common:
        if base not in class_labels_map:
            raise KeyError(f"Missing class id for basename in class_labels_map: {base}")
        x_lr.append(_imread_rgb01(lr_dict[base]))
        x_hr.append(_imread_rgb01(hr_dict[base]))
        y.append(int(class_labels_map[base]))
    return (np.array(x_lr, np.float32), np.array(x_hr, np.float32),
            np.array(y, np.int64))

"""L0 data-acquisition tools: smart crop + video -> HR/LR pair extraction.

Reference: ``data/common_methods.py:4-49`` (smart_square_crop) and
``data/preprocessing_functions.ipynb`` cells 2/5 (frame sampling with
skip-seconds/interval, crop, degrade, PNG pairs, sidecar pickles:
interpolation_map.pkl basename->interp name, class_labels_map.pkl
basename->class id, numbering continued from existing files).

Host-side by design (video decode + codecs); the degradation core itself is
the jittable tpusr.data.degrade pipeline.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

import jax

from tpusr.data.degrade import DegradeConfig, degrade_image


def smart_square_crop(img: np.ndarray) -> np.ndarray:
    """Otsu-threshold + largest-contour centered square crop
    (common_methods.py:4-49)."""
    h, w = img.shape[:2]
    crop_size = min(w, h)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    _, thresh = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    contours, _ = cv2.findContours(thresh, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    if contours:
        largest = max(contours, key=cv2.contourArea)
        x, y, ww, hh = cv2.boundingRect(largest)
        cx, cy = x + ww // 2, y + hh // 2
        half = crop_size // 2
        left = max(0, cx - half)
        top = max(0, cy - half)
        if left + crop_size > w:
            left = w - crop_size
        if top + crop_size > h:
            top = h - crop_size
        left, top = max(0, left), max(0, top)
        return img[top:top + crop_size, left:left + crop_size]
    left = (w - crop_size) // 2
    top = (h - crop_size) // 2
    return img[top:top + crop_size, left:left + crop_size]


def _next_index(directory: str, prefix: str) -> int:
    """Continue numbering from existing files (preprocessing cell 2 behavior)."""
    if not os.path.isdir(directory):
        return 0
    best = -1
    for fn in os.listdir(directory):
        if fn.startswith(prefix) and fn.endswith(".png"):
            try:
                best = max(best, int(fn[len(prefix):-4].strip("_")))
            except ValueError:
                continue
    return best + 1


def create_hr_lr_images_from_video(
    video_path: str,
    hr_dir: str,
    lr_dir: str,
    skip_seconds: float = 0.0,
    frame_interval_seconds: float = 1.0,
    hr_size: int | None = None,
    prefix: str = "sample",
    interpolation_map_path: str | None = None,
    class_labels_map_path: str | None = None,
    class_id: int | None = None,
    degrade_cfg: DegradeConfig = DegradeConfig(),
    seed: int = 0,
    max_frames: int | None = None,
):
    """Sample frames -> smart crop -> (optional resize) -> degrade -> write
    aligned HR/LR PNG pairs; persist sidecar pickles. Returns written basenames.

    Parity with preprocessing_functions.ipynb cell 2 (train variant); pass
    interpolation_map_path=None and class ids for the prediction variant
    (cell 5).
    """
    if cv2 is None:
        raise RuntimeError("cv2 is required for video extraction")
    if not os.path.exists(video_path):
        raise FileNotFoundError(video_path)
    os.makedirs(hr_dir, exist_ok=True)
    os.makedirs(lr_dir, exist_ok=True)

    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise ValueError(f"could not open video (corrupt/unsupported codec?):"
                         f" {video_path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    skip_frames = int(skip_seconds * fps)
    step = max(1, int(frame_interval_seconds * fps))

    interp_map = {}
    if interpolation_map_path and os.path.exists(interpolation_map_path):
        with open(interpolation_map_path, "rb") as f:
            interp_map = pickle.load(f)
    class_map = {}
    if class_labels_map_path and os.path.exists(class_labels_map_path):
        with open(class_labels_map_path, "rb") as f:
            class_map = pickle.load(f)

    idx = _next_index(hr_dir, prefix)
    written = []
    frame_no = 0
    key = jax.random.PRNGKey(seed)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if frame_no < skip_frames or (frame_no - skip_frames) % step != 0:
            frame_no += 1
            continue
        frame_no += 1

        crop = smart_square_crop(frame)
        if hr_size is not None:
            crop = cv2.resize(crop, (hr_size, hr_size),
                              interpolation=cv2.INTER_AREA)
        elif crop.shape[0] % 2:
            # the x0.5 degradation truncates: an odd HR (e.g. 607) yields a
            # 303 LR with 303*2 != 607, silently misaligning every 'scale'
            # mode patch pair — trim to even instead
            crop = crop[:-1, :-1]
        hr_rgb01 = cv2.cvtColor(crop, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        key, sub = jax.random.split(key)
        lr_rgb01, interp_name = degrade_image(hr_rgb01, key=sub, cfg=degrade_cfg)

        name = f"{prefix}_{idx:05d}.png"
        cv2.imwrite(os.path.join(hr_dir, name),
                    cv2.cvtColor((hr_rgb01 * 255).round().astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(lr_dir, name),
                    cv2.cvtColor((np.asarray(lr_rgb01) * 255).round().astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        if interpolation_map_path:
            interp_map[name] = interp_name
        if class_labels_map_path and class_id is not None:
            class_map[name] = int(class_id)
        written.append(name)
        idx += 1
        if max_frames is not None and len(written) >= max_frames:
            break
    cap.release()

    if interpolation_map_path:
        with open(interpolation_map_path, "wb") as f:
            pickle.dump(interp_map, f)
    if class_labels_map_path and class_id is not None:
        with open(class_labels_map_path, "wb") as f:
            pickle.dump(class_map, f)
    return written


def create_hr_lr_prediction_images_from_video(video_path, hr_dir, lr_dir,
                                              class_id=None,
                                              predictions_class_map_path=None,
                                              **kwargs):
    """Prediction-set variant (cell 5): same flow, no interpolation map,
    optional predictions_class_labels_map.pkl."""
    return create_hr_lr_images_from_video(
        video_path, hr_dir, lr_dir,
        interpolation_map_path=None,
        class_labels_map_path=predictions_class_map_path,
        class_id=class_id, **kwargs)

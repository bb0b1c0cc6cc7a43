"""L0 video-extraction tests on a synthesized clip: frame sampling, smart crop,
degradation, sidecar maps, numbering continuation (preprocessing cell 2/5)."""

import os
import pickle

import cv2
import numpy as np
import pytest

from tpusr.data.video import (
    smart_square_crop, create_hr_lr_images_from_video,
    create_hr_lr_prediction_images_from_video,
)


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (80, 60))
    rng = np.random.default_rng(0)
    for i in range(30):  # 3 seconds at 10 fps
        frame = np.full((60, 80, 3), 30, np.uint8)
        frame[10:50, 20 + i // 3 : 60 + i // 3] = (
            rng.integers(100, 255, 3).astype(np.uint8))
        w.write(frame)
    w.release()
    return path


def test_smart_square_crop_centers_object():
    img = np.full((60, 100, 3), 10, np.uint8)
    img[20:40, 60:90] = 200  # bright object right of center
    crop = smart_square_crop(img)
    assert crop.shape == (60, 60, 3)
    assert crop.mean() > img.mean()  # crop contains the object


def test_video_extraction_train(video_path, tmp_path):
    hr_dir = str(tmp_path / "HR")
    lr_dir = str(tmp_path / "LR")
    imap = str(tmp_path / "imap.pkl")
    cmap = str(tmp_path / "cmap.pkl")
    written = create_hr_lr_images_from_video(
        video_path, hr_dir, lr_dir, frame_interval_seconds=1.0, hr_size=48,
        interpolation_map_path=imap, class_labels_map_path=cmap, class_id=1,
        seed=3)
    assert len(written) == 3  # one frame per second of a 3s clip
    for name in written:
        hr = cv2.imread(os.path.join(hr_dir, name))
        lr = cv2.imread(os.path.join(lr_dir, name))
        assert hr.shape == (48, 48, 3)
        assert lr.shape == (24, 24, 3)
    with open(imap, "rb") as f:
        interp_map = pickle.load(f)
    assert set(interp_map) == set(written)
    assert all(v.startswith("INTER_") for v in interp_map.values())
    with open(cmap, "rb") as f:
        class_map = pickle.load(f)
    assert all(class_map[n] == 1 for n in written)

    # numbering continues from existing files (preprocessing cell 2 behavior)
    more = create_hr_lr_images_from_video(
        video_path, hr_dir, lr_dir, frame_interval_seconds=1.0, hr_size=48,
        interpolation_map_path=imap, class_labels_map_path=cmap, class_id=0,
        seed=4, max_frames=1)
    assert more[0] not in written
    idx_old = max(int(n.split("_")[-1][:-4]) for n in written)
    assert int(more[0].split("_")[-1][:-4]) == idx_old + 1


def test_cli_preprocess(video_path, tmp_path):
    """CLI wrapper over the extractor (L6.1): both train and predictions
    modes write pairs and sidecar maps."""
    from tpusr.cli.__main__ import main

    hr, lr = str(tmp_path / "HR"), str(tmp_path / "LR")
    imap, cmap = str(tmp_path / "im.pkl"), str(tmp_path / "cm.pkl")
    main(["preprocess", "--video", video_path, "--hr-dir", hr,
          "--lr-dir", lr, "--hr-size", "48", "--interp-map", imap,
          "--class-map", cmap, "--class-id", "1", "--seed", "3"])
    names = sorted(os.listdir(hr))
    assert len(names) == 3 and sorted(os.listdir(lr)) == names
    with open(imap, "rb") as f:
        assert set(pickle.load(f)) == set(names)

    pmap = str(tmp_path / "pm.pkl")
    main(["preprocess", "--predictions", "--video", video_path,
          "--hr-dir", str(tmp_path / "HRp"), "--lr-dir", str(tmp_path / "LRp"),
          "--hr-size", "32", "--class-map", pmap, "--class-id", "0",
          "--max-frames", "2", "--seed", "5"])
    with open(pmap, "rb") as f:
        m = pickle.load(f)
    assert len(m) == 2 and all(v == 0 for v in m.values())


def test_video_extraction_predictions(video_path, tmp_path):
    hr_dir = str(tmp_path / "HRp")
    lr_dir = str(tmp_path / "LRp")
    pmap = str(tmp_path / "pmap.pkl")
    written = create_hr_lr_prediction_images_from_video(
        video_path, hr_dir, lr_dir, class_id=0,
        predictions_class_map_path=pmap, frame_interval_seconds=1.0,
        hr_size=32, seed=5)
    assert len(written) == 3
    with open(pmap, "rb") as f:
        assert all(v == 0 for v in pickle.load(f).values())

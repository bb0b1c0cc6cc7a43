"""End-to-end smoke of the `tpusr serve` HTTP serving tier: tiny trained
checkpoints -> CLI -> real HTTP requests against the micro-batching server
(the production surface; the reference has no serving story)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compiles the pipeline + drives HTTP

LR, SCALE, PATCH, STRIDE = 24, 2, 32, 16


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    from tpusr.models.api import EDSR as EDSRFacade, FineTunedVGG16

    d = tmp_path_factory.mktemp("serve_ck")
    edsr = EDSRFacade()
    edsr.setup_model(scale_factor=SCALE, num_res_blocks=1, num_filters=8)
    edsr.trained = True
    edsr_path = edsr.save(str(d), "t")
    vgg = FineTunedVGG16()
    vgg.setup_model(input_shape=(PATCH, PATCH, 3), num_classes=2)
    vgg.trained = True
    vgg_path = vgg.save(str(d), "t")
    return edsr_path, vgg_path


def _post(url, body, as_json=True):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            data = resp.read()
    except urllib.error.HTTPError as e:
        if e.code == 400:  # surface the server's error body in the test log
            raise AssertionError(f"HTTP 400 from {url}: {e.read()}") from e
        raise
    return json.loads(data) if as_json else data


def test_serve_cli_http_end_to_end(ckpts, tmp_path):
    import cv2

    from tpusr.cli.__main__ import main

    edsr_path, vgg_path = ckpts
    port_file = tmp_path / "port"
    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(calib_dir / f"c{i}.png"),
                    (rng.random((LR, LR, 3)) * 255).astype(np.uint8))

    argv = ["serve", "--edsr-ckpt", edsr_path, "--vgg16-ckpt", vgg_path,
            "--scale", str(SCALE), "--lr-size", str(LR),
            "--patch", str(PATCH), "--stride", str(STRIDE),
            "--sr-mode", "int8", "--clf-mode", "per_patch_int8",
            "--calib-dir", str(calib_dir), "--batch-size", "4",
            "--max-wait-ms", "2", "--port", "0",
            "--port-file", str(port_file), "--max-requests", "4"]
    err = []

    def run():
        try:
            main(argv)
        except Exception as e:  # noqa: BLE001
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    deadline = time.monotonic() + 300
    while not port_file.exists() and time.monotonic() < deadline:
        if err:
            raise err[0]
        time.sleep(0.5)
    assert port_file.exists(), "server never came up"
    base = f"http://127.0.0.1:{port_file.read_text()}"

    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    assert health["config"]["sr_mode"] == "int8"
    assert health["config"]["lr_h"] == LR

    img = (rng.random((LR, LR, 3)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", img)
    assert ok
    body = png.tobytes()

    # 1: classify
    r = _post(base + "/classify", body)
    assert r["class"] in (0, 1) and 0.0 <= r["confidence"] <= 1.0
    # 2: sr returns a decodable PNG at HR size
    sr_png = _post(base + "/sr", body, as_json=False)
    sr = cv2.imdecode(np.frombuffer(sr_png, np.uint8), cv2.IMREAD_COLOR)
    assert sr.shape == (LR * SCALE, LR * SCALE, 3)
    # 3: combined endpoint
    r = _post(base + "/classify_sr", body)
    assert "sr_png_base64" in r and r["class"] in (0, 1)
    # 4: bad request -> HTTP 400, server stays healthy for the batch
    try:
        _post(base + "/classify", b"not an image")
        raised = False
    except AssertionError as e:  # _post wraps 400s with their body
        raised = True
        assert "error" in str(e)
    assert raised

    t.join(timeout=120)  # request #4 trips --max-requests -> clean shutdown
    assert not t.is_alive()
    assert not err, err

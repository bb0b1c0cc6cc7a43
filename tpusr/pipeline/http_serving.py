"""HTTP front-end for the micro-batching pipeline server.

Stdlib-only (http.server) so the serving tier needs no extra dependencies:
concurrent HTTP handler threads submit single images to one shared
``PipelineServer``, whose background worker coalesces them into fixed-shape
device batches — the micro-batching happens ACROSS simultaneous requests.

Endpoints:
  GET  /healthz     -> {"status": "ok", "config": {...}}
  POST /classify    -> {"class": int, "confidence": float} ; body = PNG/JPEG
                       LR image (any cv2-decodable format) of the configured
                       LR size
  POST /sr          -> PNG body of the super-resolved image
  POST /classify_sr -> JSON with class/confidence + base64 PNG of the SR

The reference has no serving surface at all (notebooks only); this is the
production tier of the TPU-native framework. Stand it up with
``python -m tpusr.cli serve --edsr-ckpt ... --vgg16-ckpt ...``.
"""

from __future__ import annotations

import base64
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _decode_image(body: bytes) -> np.ndarray:
    """Encoded image bytes -> RGB float32 [0,1] (h, w, 3)."""
    import cv2

    buf = np.frombuffer(body, np.uint8)
    bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    if bgr is None:
        raise ValueError("request body is not a decodable image")
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def _encode_png(rgb01: np.ndarray) -> bytes:
    import cv2

    u8 = np.clip(np.asarray(rgb01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    ok, buf = cv2.imencode(".png", cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
    if not ok:
        raise RuntimeError("png encode failed")
    return buf.tobytes()


def make_http_server(pipeline_server, lr_hw: tuple[int, int],
                     config: dict | None = None, host: str = "127.0.0.1",
                     port: int = 8512, request_timeout: float = 60.0,
                     max_requests: int | None = None):
    """Bind a ThreadingHTTPServer around a STARTED PipelineServer.

    Returns the server object; run it with ``serve_forever()`` (blocking) or
    on a thread. ``config`` is echoed from /healthz for observability.
    ``max_requests`` (smoke/CI use) shuts the server down after that many
    POSTs have been answered.
    """
    import threading

    cfg = dict(config or {})
    cfg.update({"lr_h": lr_hw[0], "lr_w": lr_hw[1]})
    served = {"n": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        # quiet per-request stderr logging; errors still surface as responses
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, code: int, obj: dict):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._reply_json(200, {"status": "ok", "config": cfg})
            else:
                self._reply_json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path not in ("/classify", "/sr", "/classify_sr"):
                self._reply_json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                self._handle_post()
            finally:
                if max_requests is not None:
                    with lock:
                        served["n"] += 1
                        done = served["n"] >= max_requests
                    if done:
                        # shutdown() from a handler thread is safe: it only
                        # signals the serve_forever loop running elsewhere
                        threading.Thread(target=self.server.shutdown,
                                         daemon=True).start()

        def _handle_post(self):
            from concurrent.futures import TimeoutError as FutTimeout

            try:
                length = int(self.headers.get("Content-Length", "0"))
                img = _decode_image(self.rfile.read(length))
                if img.shape[:2] != tuple(lr_hw):
                    raise ValueError(f"expected {lr_hw[0]}x{lr_hw[1]} LR "
                                     f"input, got {img.shape[0]}x{img.shape[1]}")
            except Exception as e:  # bad request: undecodable / wrong shape
                self._reply_json(400, {"error": str(e) or "",
                                       "type": type(e).__name__})
                return
            try:
                res = pipeline_server.submit(img).result(
                    timeout=request_timeout)
            except FutTimeout as e:
                # load balancers must see server trouble, not client error:
                # 504 = batcher/pipeline missed the deadline
                self._reply_json(504, {"error": str(e) or "",
                                       "type": type(e).__name__})
                return
            except Exception as e:  # pipeline fault / server stopped -> 500
                self._reply_json(500, {"error": str(e) or "",
                                       "type": type(e).__name__})
                return
            if self.path == "/classify":
                self._reply_json(200, {"class": res["class"],
                                       "confidence": res["confidence"]})
            elif self.path == "/sr":
                self._reply(200, _encode_png(res["sr"]), "image/png")
            else:
                self._reply_json(200, {
                    "class": res["class"],
                    "confidence": res["confidence"],
                    "sr_png_base64":
                        base64.b64encode(_encode_png(res["sr"])).decode(),
                })

    return ThreadingHTTPServer((host, port), Handler)

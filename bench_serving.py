"""Serving latency bench: p50/p99 request latency + goodput of the
micro-batching PipelineServer at the bench geometry (128x128 LR -> x4 SR ->
96/48 patch-vote), gated serving default (int8 EDSR + int8 shared trunk).

This measures the SERVING metric the throughput bench can't: time from
submit() to future-resolution for individual small requests coalesced by the
micro-batcher (max_wait_ms deadline), at client-side concurrency 1 / 8 / 16.

Tunnel caveat (PERF.md methodology): per-call RTT on the dev tunnel is
2-28 ms and CANNOT be amortized here — each request is a real host->device
->host round trip, exactly like production ingress. Numbers therefore
UPPER-bound on-host serving latency. SR outputs are returned (512x512x3
per request, ~3 MB f32) only when --return-sr is set; the default drops the
SR payload before device_get, which is what a classify-only deployment does
(the dev tunnel moves bulk data at <1 MB/s, so returning SR over it measures
the tunnel, not the server).

Run: python bench_serving.py [--concurrency 1,8,16] [--requests 64]
"""

import argparse
import json
import sys
import threading
import time

import numpy as np


def make_default_pipeline(batch_size):
    """The bench serving default on random weights (latency is
    weight-independent): int8 fused-tail EDSR + int8 shared-trunk VGG16."""
    import jax
    import jax.numpy as jnp

    from tpusr.models import EDSR, VGG16Classifier
    from tpusr.pipeline import make_serving_pipeline

    lr_hw, scale, patch, stride = (128, 128), 4, 96, 48
    sr_model = EDSR(scale_factor=scale)
    sv = sr_model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, *lr_hw, 3), jnp.float32))["params"]
    clf_model = VGG16Classifier(num_classes=2)
    cv = clf_model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, patch, patch, 3), jnp.float32))["params"]
    rng = np.random.default_rng(2)
    calib_lr = jnp.asarray(rng.random((4, *lr_hw, 3), dtype=np.float32))
    calib_patches = jnp.asarray(rng.random((16, patch, patch, 3),
                                           dtype=np.float32))
    pipe = make_serving_pipeline(sv, cv, lr_hw, scale, patch=patch,
                                 stride=stride, sr_mode="int8",
                                 clf_mode="shared_trunk_int8",
                                 calib_lr=calib_lr,
                                 calib_patches=calib_patches,
                                 sr_border_correction=False)
    return pipe, lr_hw


class _DropSR:
    """Wrap a pipeline to replace the SR payload with a 1-element token
    BEFORE the server's device_get (classify-only serving shape)."""

    def __init__(self, pipe):
        self.pipe = pipe

    def __call__(self, imgs):
        sr, classes, confs = self.pipe(imgs)
        return sr[:, :1, :1, :1], classes, confs


def run_level(server, lr_hw, concurrency, n_requests, rng):
    lat = []
    lock = threading.Lock()

    def client(k):
        r = np.random.default_rng(k)
        per = n_requests // concurrency
        for _ in range(per):
            img = r.random((*lr_hw, 3), dtype=np.float32)
            t0 = time.perf_counter()
            fut = server.submit(img)
            fut.result(timeout=120)
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    return {
        "concurrency": concurrency,
        "requests": len(lat),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "goodput_img_per_sec": round(len(lat) / wall, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--concurrency", default="1,8,16")
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--return-sr", action="store_true",
                    help="device_get the full 512^2 SR per request (measures "
                         "the tunnel's bulk bandwidth on this dev host)")
    args = ap.parse_args()

    from tpusr.pipeline.serving import PipelineServer

    pipe, lr_hw = make_default_pipeline(args.batch_size)
    if not args.return_sr:
        pipe = _DropSR(pipe)
    rng = np.random.default_rng(0)

    levels = []
    with PipelineServer(pipe, batch_size=args.batch_size,
                        max_wait_ms=args.max_wait_ms) as server:
        # warm both compiled shapes: a full batch and a single padded row
        server.submit(rng.random((*lr_hw, 3), dtype=np.float32)).result(600)
        for c in (int(x) for x in args.concurrency.split(",")):
            lvl = run_level(server, lr_hw, c, args.requests, rng)
            levels.append(lvl)
            print(f"# c={c}: p50={lvl['p50_ms']} p99={lvl['p99_ms']} ms, "
                  f"{lvl['goodput_img_per_sec']} img/s", file=sys.stderr,
                  flush=True)

    print(json.dumps({"metric": "serving_latency_int8_default",
                      "batch_size": args.batch_size,
                      "max_wait_ms": args.max_wait_ms,
                      "return_sr": bool(args.return_sr),
                      "levels": levels}))


if __name__ == "__main__":
    main()

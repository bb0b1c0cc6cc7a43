"""Serving latency bench: p50/p99 request latency + goodput of the
micro-batching PipelineServer at the bench geometry (128x128 LR -> x4 SR ->
96/48 patch-vote), on the hard-gate-certified serving default (f32 EDSR +
vote_frac-ranked int8 confidence cascade at frac=0.25 with the
trunk-collapse guard at 0.6, GATE_r05.json — the same configuration as
bench.py's cascade_int8_votefrac_guarded / `tpusr serve`).

Two methodologies, reported separately (PERF.md):

1. TUNNEL CLOSED-LOOP (default): time from submit() to future-resolution for
   individual requests coalesced by the micro-batcher, at client concurrency
   1 / 8 / 16. Per-call RTT on the dev tunnel is 2-28 ms and each request is
   a real host->device->host round trip — so these numbers measure the DEV
   TUNNEL's ingress path and UPPER-bound on-host serving latency (PERF.md
   round-4 finding: the ~110 ms floor is per-request upload, not compute).

2. DEVICE-SIDE (--device-side): the latency the SERVER itself adds, derived
   from the compiled batch-B iteration's service-time distribution measured
   on-chip (chained fori_loop iterations inside one jit, hard-sync barrier,
   repeated for a sample distribution) plus the micro-batcher's queueing
   model:
     unsaturated ingress (batch fills by deadline): max_wait_ms + S
     saturated ingress (back-to-back batches):      queue wait <= S, so <= 2S
   where S is the per-batch service time. This is the number a co-located
   production client would see, independent of the dev tunnel.

Run: python bench_serving.py [--concurrency 1,8,16] [--requests 64]
     python bench_serving.py --device-side [--samples 20] [--chain 4]
"""

import argparse
import json
import sys
import threading
import time

import numpy as np


def make_default_pipeline(batch_size, sr_mode="f32", clf_mode="cascade_int8",
                          cascade_score="vote_frac", cascade_frac=0.25,
                          cascade_guard=0.6):
    """The hard-gate-certified serving default on random weights (latency is
    weight-independent): f32 fused-tail EDSR + int8 VGG16 confidence cascade
    (vote_frac ranking, frac 0.25, trunk-collapse guard 0.6 — the
    cascade_int8_votefrac_guarded row of GATE_r05.json, the only cascade
    passing all nine seeds). Other gated modes via kwargs."""
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
                                 stride=stride, sr_mode=sr_mode,
                                 clf_mode=clf_mode,
                                 calib_lr=calib_lr,
                                 calib_patches=calib_patches,
                                 cascade_escalate_frac=cascade_frac,
                                 cascade_escalate_score=cascade_score,
                                 cascade_guard_threshold=cascade_guard)
    return pipe, lr_hw


class _DropSR:
    """Wrap a pipeline to replace the SR payload with a 1-element token
    BEFORE the server's device_get (classify-only serving shape)."""

    def __init__(self, pipe):
        self.pipe = pipe

    def __call__(self, imgs, n_valid=None):
        sr, classes, confs = self.pipe(imgs, n_valid=n_valid)
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


def run_device_side(pipe, lr_hw, batch_size, samples, chain, max_wait_ms):
    """Per-batch service-time distribution measured ON-CHIP.

    Each sample times `chain` pipeline iterations inside one jit (fori_loop,
    data-dependent feedback so no iteration can be elided) and ends with a
    one-element device->host transfer — the hard barrier the tunnel needs
    (block_until_ready can return early here, PERF.md methodology). The
    tunnel RTT is paid ONCE per sample and divided by `chain`; at chain>=4
    it contributes <7 ms / 4 < 2 ms to a ~50 ms service time.
    """
    import jax
    import jax.numpy as jnp

    run = pipe._run_jit  # (lr_batch, n_valid) -> (sr, classes, confs)
    n_valid = jnp.int32(batch_size)

    def one(x):
        sr, classes, confs = run(x, n_valid)
        # next input derives from this SR output + votes: data-dependent
        return (sr[:, ::4, ::4, :3].astype(jnp.float32)
                + confs[:, None, None, None] * 1e-6)

    chained = jax.jit(lambda x: jax.lax.fori_loop(
        0, chain, lambda i, z: one(z), x))
    x = jnp.asarray(np.random.default_rng(0).random(
        (batch_size, *lr_hw, 3), dtype=np.float32))
    hard_sync = lambda a: np.asarray(a[0, 0, 0, 0])
    out = chained(x)  # compile + warm
    hard_sync(out)
    s_ms = []
    for _ in range(samples):
        t0 = time.perf_counter()
        out = chained(out)
        hard_sync(out)
        s_ms.append((time.perf_counter() - t0) * 1e3 / chain)
    s_ms = np.sort(np.asarray(s_ms))
    p50, p99 = (float(np.percentile(s_ms, q)) for q in (50, 99))
    return {
        "methodology": "device-side: compiled batch iteration distribution "
                       "(chained jit, hard-sync barrier) + micro-batcher "
                       "queueing model",
        "batch_size": batch_size,
        "samples": samples,
        "chain": chain,
        "service_ms_p50": round(p50, 2),
        "service_ms_p99": round(p99, 2),
        "device_throughput_img_per_sec": round(
            batch_size / (float(np.mean(s_ms)) * 1e-3), 2),
        # per-request latency model (co-located client, no tunnel):
        # unsaturated: the batcher waits out max_wait_ms, then serves
        "request_p50_ms_unsaturated": round(max_wait_ms + p50, 2),
        "request_p99_ms_unsaturated": round(max_wait_ms + p99, 2),
        # saturated: batches fill instantly; a request waits at most one
        # in-flight batch + its own service
        "request_p99_ms_saturated_bound": round(2 * p99, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--concurrency", default="1,8,16")
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--sr-mode", default="f32")
    ap.add_argument("--clf-mode", default="cascade_int8")
    ap.add_argument("--cascade-score", default="vote_frac")
    ap.add_argument("--cascade-frac", type=float, default=0.25)
    ap.add_argument("--cascade-guard", type=float, default=0.6,
                    help="trunk-collapse guard threshold; <=0 disarms "
                         "(the guard is part of the certified default)")
    ap.add_argument("--device-side", action="store_true",
                    help="measure the on-chip service-time distribution and "
                         "derive co-located request latency (no tunnel)")
    ap.add_argument("--samples", type=int, default=20)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--return-sr", action="store_true",
                    help="device_get the full 512^2 SR per request (measures "
                         "the tunnel's bulk bandwidth on this dev host)")
    args = ap.parse_args()

    from tpusr.pipeline.serving import PipelineServer

    pipe, lr_hw = make_default_pipeline(
        args.batch_size, sr_mode=args.sr_mode, clf_mode=args.clf_mode,
        cascade_score=args.cascade_score, cascade_frac=args.cascade_frac,
        cascade_guard=args.cascade_guard if args.cascade_guard > 0 else None)

    if args.device_side:
        res = run_device_side(pipe, lr_hw, args.batch_size, args.samples,
                              args.chain, args.max_wait_ms)
        print(json.dumps({"metric": "serving_latency_device_side",
                          "sr_mode": args.sr_mode,
                          "clf_mode": args.clf_mode, **res}))
        return

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

    print(json.dumps({"metric": "serving_latency_tunnel_closed_loop",
                      "sr_mode": args.sr_mode,
                      "clf_mode": args.clf_mode,
                      "batch_size": args.batch_size,
                      "max_wait_ms": args.max_wait_ms,
                      "return_sr": bool(args.return_sr),
                      "levels": levels}))


if __name__ == "__main__":
    main()

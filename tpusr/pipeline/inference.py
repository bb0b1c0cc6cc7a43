"""Patch-based SR inference — the reference's hot path, as ONE jit'd graph.

Reference flow (``SRCNN_model.py:111-247``, ``EDSR_model.py:189-315``,
``ESRGAN_model.py:858-979``): reflect-pad -> python patch loop -> batched
predict -> host overlap-add -> crop -> clip. Here pad/patchify/net/overlap-add
compile into a single XLA graph with zero host round-trips; the metrics dict
keeps the reference's field names (time_sec, gpu_mean_current_mb, gpu_peak_mb).
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.core.pad import pad_amounts
from tpusr.core.patches import overlap_add, patch_grid_size, patchify
from tpusr.core.resize import resize
from tpusr.train.callbacks import _device_memory_info, _mb


def sr_inference_fn(apply_fn, lr_hw: tuple[int, int], patch: int, stride: int,
                    scale: int, in_range=(0.0, 1.0), out_range=(0.0, 1.0)):
    """Build the fused pad->patchify->net->overlap-add->crop->clip function for
    a fixed LR shape. `apply_fn(patches)` maps (N,p,p,3) -> (N,p*scale,p*scale,3).

    in_range/out_range handle ESRGAN's [-1,1] convention
    (ESRGAN_model.py:929,946)."""
    h, w = lr_hw
    pad_h, pad_w = pad_amounts(h, w, patch, stride)
    nh, nw = patch_grid_size(h + pad_h, w + pad_w, patch, stride)

    @jax.jit
    def fn(lr_img):
        x = jnp.pad(lr_img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
        patches = patchify(x, patch, stride)
        if in_range != (0.0, 1.0):
            lo, hi = in_range
            patches = patches * (hi - lo) + lo
        preds = apply_fn(patches)
        if out_range != (0.0, 1.0):
            lo, hi = out_range
            preds = (preds - lo) / (hi - lo)
        sr = overlap_add(preds, (nh, nw), stride * scale,
                         crop_hw=(h * scale, w * scale))
        return jnp.clip(sr, 0.0, 1.0)

    return fn


def _timed_call(fn, *args):
    """Run a compiled call with the reference's inference-metrics protocol."""
    mem_begin = _device_memory_info()
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0
    mem_end = _device_memory_info()

    cur_b = mem_begin.get("current") if isinstance(mem_begin, dict) else None
    cur_e = mem_end.get("current") if isinstance(mem_end, dict) else None
    if cur_b is not None and cur_e is not None:
        mean_cur = _mb((cur_b + cur_e) / 2.0)
    else:
        mean_cur = _mb(cur_e) if cur_e is not None else None
    pk_b = mem_begin.get("peak") if isinstance(mem_begin, dict) else None
    pk_e = mem_end.get("peak") if isinstance(mem_end, dict) else None
    peak = _mb(max(pk_b, pk_e)) if (pk_b is not None and pk_e is not None) else (
        _mb(pk_e) if pk_e is not None else None)
    return out, {
        "time_sec": float(elapsed),
        "gpu_mean_current_mb": mean_cur,
        "gpu_peak_mb": peak,
    }


def super_resolve_image(apply_fn, lr_img, patch_size_lr: int = 48,
                        stride: int = 24, scale: int = 2,
                        normalize_pm1: bool = False):
    """EDSR/ESRGAN-style patch SR on a single LR image (EDSR_model.py:189-315).

    `apply_fn(patches)` is the bound model forward (params closed over).
    Set normalize_pm1=True for ESRGAN's tanh generator."""
    lr_img = jnp.asarray(np.asarray(lr_img, np.float32))
    # map [0,1] input -> model range; model output -> [0,1]
    in_map = (0.0, 1.0) if not normalize_pm1 else (-1.0, 1.0)
    fn = _cached_sr_fn(apply_fn, lr_img.shape[:2], patch_size_lr, stride, scale,
                       in_map)
    sr, metrics = _timed_call(fn, lr_img)
    return sr, metrics


# Cache values hold a reference to the keyed apply_fn: id() is only unique
# among live objects, so keeping it alive prevents a recycled id from
# resolving to a stale compiled closure over old weights. LRU-bounded so a
# loop over many shapes/models cannot pin compiled executables without limit.
from collections import OrderedDict

_SR_FN_CACHE: OrderedDict = OrderedDict()
_SR_FN_CACHE_MAX = 32


def _cache_get(key, apply_fn):
    entry = _SR_FN_CACHE.get(key)
    if entry is not None and entry[1] is apply_fn:
        _SR_FN_CACHE.move_to_end(key)
        return entry[0]
    return None


def _cache_put(key, apply_fn, fn):
    _SR_FN_CACHE[key] = (fn, apply_fn)
    _SR_FN_CACHE.move_to_end(key)
    while len(_SR_FN_CACHE) > _SR_FN_CACHE_MAX:
        _SR_FN_CACHE.popitem(last=False)
    return fn


def _cached_sr_fn(apply_fn, lr_hw, patch, stride, scale, in_map):
    """LRU-cached ``sr_inference_fn`` — the model's range is both its input
    and output convention (the [0,1]<->[-1,1] maps of ESRGAN_model.py:929,946
    are symmetric), so in_map serves as both."""
    key = (id(apply_fn), lr_hw, patch, stride, scale, in_map)
    cached = _cache_get(key, apply_fn)
    if cached is None:
        fn = sr_inference_fn(apply_fn, lr_hw, patch, stride, scale,
                             in_range=in_map, out_range=in_map)
        cached = _cache_put(key, apply_fn, fn)
    return cached


def srcnn_super_resolve(apply_fn, lr_img, hr_h: int, hr_w: int,
                        patch_size: int = 33, stride: int = 14,
                        interpolation: str = "bicubic"):
    """SRCNN-style SR: upscale LR to HR size first, then same-size patch
    restoration (SRCNN_model.py:111-247)."""
    lr_img = jnp.asarray(np.asarray(lr_img, np.float32))
    key = (id(apply_fn), lr_img.shape, hr_h, hr_w, patch_size, stride, interpolation)
    cached = _cache_get(key, apply_fn)
    if cached is None:
        pad_h, pad_w = pad_amounts(hr_h, hr_w, patch_size, stride)
        nh, nw = patch_grid_size(hr_h + pad_h, hr_w + pad_w, patch_size, stride)

        @jax.jit
        def fn(img):
            up = jnp.clip(resize(img, (hr_h, hr_w), interpolation), 0.0, 1.0)
            x = jnp.pad(up, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            patches = patchify(x, patch_size, stride)
            preds = apply_fn(patches)
            sr = overlap_add(preds, (nh, nw), stride, crop_hw=(hr_h, hr_w))
            return jnp.clip(sr, 0.0, 1.0)

        cached = _cache_put(key, apply_fn, fn)
    return _timed_call(cached, lr_img)


def _largest_divisor_at_most(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def super_resolve_full_image(generator, variables, lr_img, mesh=None,
                             attention_block_size: int = 4096,
                             axis: str = "data"):
    """Full-image ESRGAN SR — no patch decomposition, no overlap-add.

    TPU-native extension of the reference's patch pipeline
    (``ESRGAN_model.py:858-979``): the whole image goes through the
    generator in one graph, so there are no patch-seam artifacts and no
    overlap recomputation. The dense self-attention map is O((HW)^2) and is
    what normally forbids this (SURVEY §5 long-context analog); here it is
    bounded by:

    - single device: blockwise online-softmax attention
      (``models/layers.py``) with the largest block <= attention_block_size
      that divides the token count — O(HW * block) memory;
    - ``mesh``: spatial H-axis sharding + ring attention over the sharded
      token axis (``dist/spatial.py``) when H is divisible by the mesh axis
      size — each device holds HW/n_dev tokens, key/value blocks stream
      around the ring on ICI.

    Input in [0,1]; returns (sr_img in [0,1], metrics dict) with the same
    metrics fields as ``super_resolve_image``.
    """
    lr = jnp.asarray(np.asarray(lr_img, np.float32))
    x = lr[None] * 2.0 - 1.0
    h, w = int(lr.shape[0]), int(lr.shape[1])

    if mesh is not None and h % mesh.shape[axis] == 0:
        from tpusr.dist.spatial import full_image_esrgan_sr

        def fn(xb):  # the jitted H-sharded apply is cached in dist.spatial
            return full_image_esrgan_sr(generator, variables, xb, mesh, axis)
    else:
        block = _largest_divisor_at_most(h * w, attention_block_size)
        gen = generator.clone(attention_block_size=block, attention_fn=None)
        # cached per generator config (which includes the block size), so a
        # loop over same-shape images compiles once — variables stay an
        # argument, not a closure, to keep the trace weight-independent
        jfn = _full_image_apply_fn(gen)
        fn = lambda xb: jfn(variables, xb)

    sr, metrics = _timed_call(fn, x)
    return np.asarray(jnp.clip((sr[0] + 1.0) / 2.0, 0.0, 1.0)), metrics


@functools.lru_cache(maxsize=16)
def _full_image_apply_fn(gen):
    return jax.jit(gen.apply)

"""EDSR fast forward: polyphase (pre-interleave) tail.

Profiling the north-star pipeline (PERF.md round 2) shows the final
pixel-shuffle costs two full-tensor HBM copies — XLA relayouts the up-conv
output (bf16, 4.3 GB at batch 128) and then materializes the 6-D shuffle —
~0.21 ms/img, a quarter of the SR stage. The tail conv over the interleaved
image is mathematically a conv over the PRE-shuffle tensor with a
block-structured kernel (standard polyphase identity): for output sub-pixel
phase (e, f) and tap (dy, dx), the source pixel lands in pre-shuffle cell
offset floor((e+dy)/r) with phase (e+dy) mod r. Refactoring the tail kernel
once at setup time lets the whole network finish in polyphase layout; the
only interleave left runs on the final (r^2 * channels)-channel tensor —
3 channels wide after quantization, ~50x fewer bytes.

Exact parity: pixel_shuffle(forward_poly(x)) == EDSR.apply(x) (same multiply
adds; tested to f32 round-off in tests/test_edsr_fast.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models.layers import pixel_shuffle


def polyphase_tail_kernel(w_tail: np.ndarray, r: int) -> np.ndarray:
    """Refactor a (3, 3, cin, cout) SAME-conv kernel that runs after a
    pixel-shuffle(r) into a (3, 3, cin*r^2, cout*r^2) kernel that runs
    before it (on the pre-shuffle tensor).

    Channel orders follow the DCR pixel_shuffle: pre-shuffle channel
    ch(e, f, c) = e*(r*cin) + f*cin + c; output channel o(e, f, c3) =
    e*(r*cout) + f*cout + c3 — so ``pixel_shuffle(conv(z, W_poly), r)``
    equals ``conv(pixel_shuffle(z, r), w_tail)``.
    """
    kh, kw, cin, cout = w_tail.shape
    assert (kh, kw) == (3, 3), "polyphase refactor written for 3x3 tails"
    w = np.zeros((3, 3, cin * r * r, cout * r * r), np.asarray(w_tail).dtype)
    for e in range(r):
        for f in range(r):
            for dy in (-1, 0, 1):
                u, ep = divmod(e + dy, r)   # cell offset, source row-phase
                if not -1 <= u <= 1:
                    continue
                for dx in (-1, 0, 1):
                    v, fp = divmod(f + dx, r)
                    if not -1 <= v <= 1:
                        continue
                    w[u + 1, v + 1,
                      ep * r * cin + fp * cin: ep * r * cin + fp * cin + cin,
                      e * r * cout + f * cout: e * r * cout + f * cout + cout] \
                        = w_tail[dy + 1, dx + 1]
    return w


def dualize_conv_kernel(k: np.ndarray) -> np.ndarray:
    """(3, 3, cin, cout) SAME-conv kernel -> (3, 4, cin, 2*cout) dual-pixel
    kernel computing two horizontally adjacent output pixels per GEMM row.

    EDSR's 64 feature channels fill only half the MXU's 128 lanes; emitting
    the pixel pair (w=2j, 2j+1) as 2*cout=128 channels of a stride-(1, 2)
    conv over the union window (input cols 2j-1..2j+2, i.e. kernel width 4
    with explicit padding (1, 2)) doubles lane occupancy for 4/3 the FLOPs.
    Exact: the extra taps are zero, so each output is the same sum as the
    original conv. Measured 1.28x on an isolated bf16 body conv but a net
    LOSS inside the EDSR body (paired->unpaired relayout per conv; PERF.md
    round 2) — kept as a building block, not used by the fused SR path.
    """
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3), "dual-pixel refactor written for 3x3 kernels"
    k2 = np.zeros((3, 4, cin, 2 * cout), np.asarray(k).dtype)
    k2[:, 0:3, :, :cout] = k     # even output pixel: window cols 0..2
    k2[:, 1:4, :, cout:] = k     # odd output pixel: window cols 1..3
    return k2


def _conv_dual(k2, b, x, precision=None):
    """Apply a ``dualize_conv_kernel`` kernel: x (N, H, W, cin) with W even
    -> (N, H, W, cout), numerically the SAME-conv with the original kernel."""
    n, h, w, _ = x.shape
    cout = k2.shape[-1] // 2
    y = jax.lax.conv_general_dilated(
        x, k2, (1, 2), [(1, 1), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    y = y + jnp.concatenate([b, b])
    return y.reshape(n, h, w // 2, 2, cout).reshape(n, h, w, cout)


def _conv(p, x, dtype=None, precision=None):
    k = p["kernel"]
    b = p["bias"]
    if dtype is not None:
        k, b = k.astype(dtype), b.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision)
    return y + b


def edsr_forward_poly(params: dict, x: jnp.ndarray, scale_factor: int,
                      res_scaling: float = 0.1,
                      poly_tail_kernel: jnp.ndarray | None = None):
    """EDSR forward that returns the CLIPPED polyphase output
    (N, H*s/r, W*s/r, r^2*channels) where r is the final shuffle factor
    (2 for x2/x4, 3 for x3). ``pixel_shuffle(result, r)`` == the standard
    ``EDSR.apply`` output.

    ``poly_tail_kernel``: pass a precomputed ``polyphase_tail_kernel`` to
    avoid rebuilding it per call (it is a trace-time constant under jit).
    """
    n_res = len([k for k in params if k.startswith("res")])
    head = _conv(params["head"], x)
    y = head
    for i in range(n_res):
        p = params[f"res{i}"]
        t = jax.nn.relu(_conv(p["conv1"], y))
        t = _conv(p["conv2"], t)
        y = y + res_scaling * t
    y = _conv(params["body"], y) + head

    if scale_factor in (2, 3):
        r = scale_factor
        z = _conv(params["up0"], y)              # (N, H, W, f*r^2)
    else:  # x4: interleave the FIRST x2 normally (cheap at H x W), keep the
        # second stage polyphase
        r = 2
        z = pixel_shuffle(_conv(params["up0"], y), 2)
        z = _conv(params["up1"], z)              # (N, 2H, 2W, f*4)

    w_tail = params["tail"]["kernel"]
    cin = w_tail.shape[2]
    assert z.shape[-1] == cin * r * r
    if poly_tail_kernel is None:
        if isinstance(w_tail, jax.core.Tracer):
            raise ValueError(
                "edsr_forward_poly: the on-the-fly polyphase tail kernel is "
                "host-computed and cannot be built from traced params — "
                "precompute it (polyphase_tail_kernel) and pass "
                "poly_tail_kernel=, or close the params over the jit")
        poly_tail_kernel = jnp.asarray(
            polyphase_tail_kernel(np.asarray(jax.device_get(w_tail)), r))
    zp = jax.lax.conv_general_dilated(
        z, poly_tail_kernel.astype(z.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bias = params["tail"]["bias"].astype(zp.dtype)
    zp = zp + jnp.tile(bias, r * r)
    return jnp.clip(zp, 0.0, 1.0), r


def _chained_tail(params: dict, y: jnp.ndarray, scale_factor: int,
                  precision=None) -> jnp.ndarray:
    """The reference tail: up conv(s) + pixel shuffle(s) + final conv (no
    clip). Pure function of the body output ``y``."""
    def conv(p, x):
        return jax.lax.conv_general_dilated(
            x, p["kernel"].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision) + p["bias"].astype(x.dtype)

    if scale_factor in (2, 3):
        z = pixel_shuffle(conv(params["up0"], y), scale_factor)
    else:
        z = pixel_shuffle(conv(params["up0"], y), 2)
        z = pixel_shuffle(conv(params["up1"], z), 2)
    return conv(params["tail"], z)


def _interleaved_to_poly(img: jnp.ndarray, s: int) -> jnp.ndarray:
    """(N, s*H, s*W, C) -> (N, H, W, s^2*C), inverse of pixel_shuffle DCR."""
    n, hh, ww, c = img.shape
    h, w = hh // s, ww // s
    x = img.reshape(n, h, s, w, s, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h, w, s * s * c)


def fused_tail_kernel(params: dict, scale_factor: int):
    """Collapse the (entirely linear) EDSR upsample tail into one composed
    conv over the body output, in polyphase space.

    up conv(s), pixel shuffle(s), and the final conv have NO activations
    between them (EDSR_model.py:96-125), so their composition is a single
    (k, k, f, s^2*channels) conv on the low-res grid — k = 7 for x4 (three
    3x3 stages), 5 for x2/x3 — built here by impulse probing the chained
    path at HIGHEST precision. ~5.6x fewer FLOPs than the chained tail at
    x4 and no pixel-shuffle relayout copies.

    Interior-exact; the chained per-stage zero paddings differ from a single
    composed conv within ``pad`` cells of each border — callers must patch
    the border band with the chained path (``make_fused_sr_apply`` does).
    Returns (W_eff (k,k,f,s^2*c), b_eff (s^2*c,), pad).
    """
    s = scale_factor
    n_stages = 3 if s == 4 else 2
    k_eff = 2 * n_stages + 1
    pad = k_eff // 2
    f = params["up0"]["kernel"].shape[2]
    c_out = params["tail"]["kernel"].shape[3]

    S = 4 * pad + 1
    p0 = S // 2
    hi = jax.lax.Precision.HIGHEST
    # impulse responses: one input image per (input channel)
    imp = np.zeros((f, S, S, f), np.float32)
    for ci in range(f):
        imp[ci, p0, p0, ci] = 1.0
    zero_bias = jax.tree.map(
        lambda a: jnp.zeros_like(a) if a.ndim == 1 else a, params)
    resp = np.asarray(_chained_tail(zero_bias, jnp.asarray(imp), s,
                                    precision=hi))          # (f, sS, sS, c)
    b_eff_img = np.asarray(_chained_tail(
        params, jnp.zeros((1, S, S, f), jnp.float32), s,
        precision=hi))[0, s * p0: s * p0 + s, s * p0: s * p0 + s, :]
    b_eff = b_eff_img.reshape(s * s * c_out)                # o(E,F,c) order

    w = np.zeros((k_eff, k_eff, f, s * s * c_out), np.float32)
    for tr in range(k_eff):
        for tc in range(k_eff):
            pr = p0 + pad - tr
            pc = p0 + pad - tc
            blk = resp[:, s * pr: s * pr + s, s * pc: s * pc + s, :]
            w[tr, tc] = blk.reshape(f, s * s * c_out)
    return jnp.asarray(w), jnp.asarray(b_eff), pad


def make_fused_sr_apply(params: dict, scale_factor: int,
                        res_scaling: float = 0.1, dtype=jnp.bfloat16,
                        precision=None):
    """Bind EDSR params into a forward with the fused linear tail.

    Returns (fn, s): ``fn(x) -> y_poly`` of shape (N, H, W, s^2*channels),
    clipped to [0,1]; ``pixel_shuffle(y_poly, s)`` equals ``EDSR.apply`` —
    exactly, including borders: the composed conv covers the interior and a
    ``pad``-cell border band is recomputed with the chained reference tail
    on thin slabs (<= 4*(2*pad+1)/H of the tail cost).

    Note: the body convs deliberately stay in the plain 3x3x64 form — the
    dual-pixel transform (``dualize_conv_kernel``) is 1.28x faster on an
    isolated conv but 0.79x in-net (the paired->unpaired relayout after
    every conv costs more than the lane fill saves; XLA's in-net body already
    runs at ~59% of bf16 peak). Measurements in PERF.md round 2.
    """
    s = scale_factor
    w_eff, b_eff, pad = fused_tail_kernel(
        jax.tree.map(lambda a: a.astype(jnp.float32), params), s)
    cast = jax.tree.map(lambda a: a.astype(dtype), params)
    w_eff_c = w_eff.astype(dtype)
    b_eff_c = b_eff.astype(dtype)
    slab = 2 * pad + 1
    c_out = params["tail"]["kernel"].shape[3]

    def body_out(x):
        n_res = len([k for k in cast if k.startswith("res")])
        head = _conv(cast["head"], x, precision=precision)
        y = head
        for i in range(n_res):
            p = cast[f"res{i}"]
            t = jax.nn.relu(_conv(p["conv1"], y, precision=precision))
            t = _conv(p["conv2"], t, precision=precision)
            y = y + res_scaling * t
        return _conv(cast["body"], y, precision=precision) + head

    def chained_poly(yslab):
        out = _chained_tail(cast, yslab, s, precision=precision)
        return _interleaved_to_poly(out, s)

    def fn(x):
        y = body_out(x.astype(dtype))
        z = jax.lax.conv_general_dilated(
            y, w_eff_c, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=precision) + b_eff_c
        # border-band correction: chained zero-padding semantics
        top = chained_poly(y[:, :slab])[:, :pad]
        bot = chained_poly(y[:, -slab:])[:, -pad:]
        left = chained_poly(y[:, :, :slab])[:, :, :pad]
        right = chained_poly(y[:, :, -slab:])[:, :, -pad:]
        z = z.at[:, :pad].set(top).at[:, -pad:].set(bot)
        z = z.at[:, :, :pad].set(left).at[:, :, -pad:].set(right)
        return jnp.clip(z, 0.0, 1.0)

    return fn, s


def make_poly_sr_apply(params: dict, scale_factor: int,
                       res_scaling: float = 0.1, dtype=jnp.bfloat16):
    """Bind an EDSR params tree into a jit-friendly polyphase forward
    (single-stage variant: only the final tail conv is refactored
    pre-shuffle; ``make_fused_sr_apply`` collapses the whole linear tail and
    is strictly faster).

    Returns (fn, r): ``fn(x) -> y_poly`` with ``pixel_shuffle(y_poly, r)``
    the SR image. The refactored tail kernel is precomputed host-side.
    """
    if scale_factor in (2, 3):
        r = scale_factor
    else:
        r = 2
    w_tail = np.asarray(jax.device_get(params["tail"]["kernel"]), np.float32)
    wp = jnp.asarray(polyphase_tail_kernel(w_tail, r))
    cast = jax.tree.map(lambda a: a.astype(dtype), params)

    def fn(x):
        y_poly, _ = edsr_forward_poly(cast, x.astype(dtype), scale_factor,
                                      res_scaling, wp.astype(dtype))
        return y_poly

    return fn, r

"""Pallas TPU kernels for the int8 VGG16 classifier hot path.

The north-star pipeline spends over a third of its time materializing and
convolving block-1 activations: the (NP, 96, 96, 3) patch tensor and the
(NP, 96, 96, 64) block-1 activations are layout-poison on TPU (3 / 64 lanes
of 128), and XLA moves ~32 GB of HBM traffic per bench iteration through
them (PERF.md round 2: patchify ~15 ms, b1c1 ~50 ms at 0.5% MXU, b1c2
~62 ms at 35%, pool ~11 ms). This module fuses

    patch extraction -> b1c1 -> b1c2 -> 2x2 maxpool

into ONE Pallas kernel whose intermediates all live in VMEM.

Reference semantics (independently zero-padded 96x96 patches, stride 48,
Keras SAME convs — /root/reference/SRModels/defect_detection_models/
VGG16_model.py:206-242) are preserved exactly; requant matches
``tpusr.models.quant`` bit for bit.

Design:

- **img36 input layout** (built by ``build_img36*`` in XLA): for every
  global column-pair cell J (cols 2J, 2J+1) and every image row y, the full
  b1c1 dual-pixel conv window — 3 rows x 4 cols x 3 channels = 36 int8
  values — is stacked into a 128-lane slot: ``(N, RY, CE*128)``. b1c1 then
  collapses to ONE dense (4608, 128)@(128, 128) MXU GEMM per patch (the 92
  zero K-lanes cost ~10x the minimal b1c1 FLOPs, but b1c1 is only 4% of
  block-1 work and this runs at full PE utilization).
- **Patch-relative SAME padding** cannot be baked into img36 (patches
  overlap: the same cell is interior to one patch and border to its
  neighbor), so the kernel zeroes the border window lanes of each patch's
  LHS with one precomputed iota mask select.
- **Paired frames** for b1c2: 64-channel activations live as zero-bordered
  column-pair frames of 128 lanes, so the 3x3 conv is 6 accumulating dense
  (800, 128)@(128, 128) taps (3 dy x 2 cell offsets) at 4/3 the useful
  FLOPs — vs XLA's ~35% MXU utilization on this layer. The 2x2 maxpool
  consumes the odd-paired output directly.

Output: block-2 input frames — even-paired, zero-bordered,
``(NP, 1312, 128)`` int8 (row = y_pad*26 + cell; cell 0/25 and y_pad 0/49
are the zero border; rows 1300+ are slack).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# host-side weight packing
# ---------------------------------------------------------------------------

def pack_b1c1_img36(kernel: np.ndarray) -> np.ndarray:
    """(3, 3, 3, 64) conv kernel -> (128, 128) GEMM matrix for the img36
    layout: K-lane dy*12 + f*3 + c (f = window column 0..3 relative to the
    output pair's col 2j-1), out lanes [0:64] = even pixel (2j), [64:128] =
    odd pixel (2j+1). Rows 36..127 are zero."""
    k = np.asarray(kernel)
    assert k.shape == (3, 3, 3, 64), k.shape
    w = np.zeros((3, 4, 3, 128), k.dtype)
    w[:, 0:3, :, :64] = k        # even output pixel: window cols 0..2
    w[:, 1:4, :, 64:] = k        # odd output pixel: window cols 1..3
    return np.concatenate([w.reshape(36, 128),
                           np.zeros((92, 128), k.dtype)], axis=0)


def pack_pair_taps_e2o(kernel: np.ndarray) -> np.ndarray:
    """(3, 3, C, C) conv kernel -> (3, 2, 2C, 2C) tap matrices for a conv
    from an even-paired frame (frame cell fc holds cols 2fc-2, 2fc-1; cell 0
    is the zero border) to odd-paired output (cell i holds cols 2i-1, 2i).

    Out cell i accumulates frame cells i (tap u=0) and i+1 (u=1).
    """
    k = np.asarray(kernel)
    kh, kw, ci, co = k.shape
    assert (kh, kw) == (3, 3)
    t = np.zeros((3, 2, 2 * ci, 2 * co), k.dtype)
    for dy in range(3):
        # u=0: frame cell i = cols (2i-2, 2i-1)
        t[dy, 0, 0:ci, 0:co] = k[dy, 0]        # b0 (2i-2) -> out b0 (2i-1)
        t[dy, 0, ci:, 0:co] = k[dy, 1]         # b1 (2i-1) -> out b0
        t[dy, 0, ci:, co:] = k[dy, 0]          # b1 (2i-1) -> out b1 (2i)
        # u=1: frame cell i+1 = cols (2i, 2i+1)
        t[dy, 1, 0:ci, 0:co] = k[dy, 2]        # b0 (2i)   -> out b0
        t[dy, 1, 0:ci, co:] = k[dy, 1]         # b0 (2i)   -> out b1
        t[dy, 1, ci:, co:] = k[dy, 2]          # b1 (2i+1) -> out b1
    return t


# ---------------------------------------------------------------------------
# img36 builders (XLA side)
# ---------------------------------------------------------------------------

def grid_counts(h: int, w: int, patch: int = 96, stride: int = 48):
    """Reference patch-grid geometry (pad = max((p-(d%s))%s, p-s), then
    range(0, d_pad-p+1, s)) — loading_methods.py:6-26."""
    def n_of(d):
        pad = max((patch - (d % stride)) % stride, patch - stride)
        return (d + pad - patch) // stride + 1
    return n_of(h), n_of(w)


def build_img36_from_image(img: jnp.ndarray, n_pr: int, n_pc: int):
    """int8 full-res image (N, H, W, 3) -> img36 (N, RY, CE*128).

    Rows/cols beyond H/W are np.pad-'reflect' continuations (row H+t =
    row H-2-t), matching the bench/reference padding; values that a patch
    must see as SAME-conv zeros are handled by the kernel's border mask.
    """
    n, h, w, _ = img.shape
    ry = 48 * (n_pr - 1) + 96
    ce = 24 * (n_pc - 1) + 48
    ref_r, ref_c = ry - h, 2 * ce - w
    # np.pad(mode='reflect') can only reflect dim-1 rows in one pass; fail
    # loudly on undersized inputs instead of silently taking a wrong slice.
    if ref_r > h - 2 or ref_c > w - 2:
        raise ValueError(
            f"image ({h}x{w}) too small to reflect-pad to ({ry}x{2 * ce}): "
            f"need pad ({max(ref_r, 0)},{max(ref_c, 0)}) <= dim-2")
    x = img
    if ref_r > 0:
        x = jnp.concatenate(
            [x, jnp.flip(x[:, h - 1 - ref_r: h - 1], axis=1)], axis=1)
    if ref_c > 0:
        x = jnp.concatenate(
            [x, jnp.flip(x[:, :, w - 1 - ref_c: w - 1], axis=2)], axis=2)
    # pixel col c lives at lanes (c+1)*3 (one zero pixel on the left), one
    # zero pixel on the right for the (masked) rightmost window column
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    v = x.reshape(n, ry, (2 * ce + 2) * 3)
    s0 = v[:, :, 0: 6 * ce].reshape(n, ry, ce, 6)
    s1 = v[:, :, 6: 6 * ce + 6].reshape(n, ry, ce, 6)
    c12 = jnp.concatenate([s0, s1], axis=-1)          # (n, ry, ce, 12)
    cp = jnp.pad(c12, ((0, 0), (1, 1), (0, 0), (0, 0)))
    r36 = jnp.concatenate(
        [cp[:, 0: ry], cp[:, 1: ry + 1], cp[:, 2: ry + 2]], axis=-1)
    r128 = jnp.pad(r36, ((0, 0), (0, 0), (0, 0), (0, 92)))
    return r128.reshape(n, ry, ce * 128)


def build_img36_from_poly(srq_poly: jnp.ndarray, n_pr: int, n_pc: int,
                          scale: int = 4):
    """int8 polyphase SR image (N, Hc, Wc, scale^2*3) -> img36. The full-res
    image (N, Hc*scale, Wc*scale, 3) never materializes in a 3-lane layout —
    XLA fuses the shuffle into the window build."""
    n, hc, wc, cc = srq_poly.shape
    assert cc == scale * scale * 3
    x = srq_poly.reshape(n, hc, wc, scale, scale, 3)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        n, hc * scale, wc * scale, 3)
    return build_img36_from_image(x, n_pr, n_pc)


# ---------------------------------------------------------------------------
# the fused block-1 kernel
# ---------------------------------------------------------------------------

OUT_ROWS = 1312          # 50*26 flattened block-2 frame rows + slack
_FRAME_ROWS = 4928       # 98*50 flattened b1c2 input frame rows + slack


def _border_mask():
    """(4608, 128) bool: False where a patch's LHS window lanes must be
    zeroed to honor per-patch SAME zero padding."""
    row = jax.lax.broadcasted_iota(jnp.int32, (4608, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (4608, 128), 1)
    y = row // 48
    j = jax.lax.rem(row, 48)
    q = jax.lax.rem(lane, 12)
    in36 = lane < 36
    bad = (jnp.logical_and(y == 0, lane < 12) |
           jnp.logical_and(y == 95, jnp.logical_and(lane >= 24, in36)) |
           jnp.logical_and(j == 0, jnp.logical_and(q < 3, in36)) |
           jnp.logical_and(j == 47, jnp.logical_and(q >= 9, in36)))
    return jnp.logical_not(bad)


def _block1_kernel(src_ref, w1_ref, rs1_ref, bs1_ref, w2_ref, rs2_ref,
                   bs2_ref, out_ref, band_ref, frame_ref, lhs2_ref, pool_ref,
                   band_sem, *, n_pc: int):
    n = pl.program_id(0)
    pr = pl.program_id(1)
    n_pr = pl.num_programs(1)
    step = n * n_pr + pr
    slot = jax.lax.rem(step, 2)

    def band_dma(to_slot, img, row0):
        return pltpu.make_async_copy(
            src_ref.at[img, pl.ds(row0, 96), :],
            band_ref.at[to_slot], band_sem.at[to_slot])

    @pl.when(step == 0)
    def _():
        band_dma(slot, n, 48 * pr).start()

    nxt = step + 1

    @pl.when(nxt < pl.num_programs(0) * n_pr)
    def _():
        band_dma(1 - slot, nxt // n_pr, 48 * jax.lax.rem(nxt, n_pr)).start()

    band_dma(slot, n, 48 * pr).wait()

    rs1 = rs1_ref[0, :]
    bs1 = bs1_ref[0, :]
    rs2 = rs2_ref[0, :]
    bs2 = bs2_ref[0, :]
    mask = _border_mask()

    # frame border rows are never written by the interior store: zero once
    frame_ref[0:50, :] = jnp.zeros((50, 128), jnp.int8)
    frame_ref[pl.ds(4850, 78), :] = jnp.zeros((78, 128), jnp.int8)
    # pool scratch cell borders likewise
    pool_ref[:, 0:1, :] = jnp.zeros((48, 1, 128), jnp.int8)
    pool_ref[:, 25:26, :] = jnp.zeros((48, 1, 128), jnp.int8)

    for pc in range(n_pc):
        # ---- b1c1: one dense GEMM over the prebuilt windows ----
        win = band_ref[slot, :, pl.ds(3072 * pc, 6144)]    # (96, 6144)
        lhs = win.reshape(4608, 128)
        lhs = jnp.where(mask, lhs, jnp.int8(0))
        acc1 = jax.lax.dot_general(
            lhs, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        q1 = jnp.clip(acc1.astype(jnp.float32) * rs1 + bs1, 0.0, 127.0)
        q1 = q1.astype(jnp.int8).reshape(96, 48, 128)

        # ---- store into the even-paired zero-bordered frame ----
        e1 = jnp.pad(q1, ((0, 0), (1, 1), (0, 0)))         # (96, 50, 128)
        frame_ref[pl.ds(50, 4800), :] = e1.reshape(4800, 128)

        # ---- b1c2: ONE K=768 dense dot (6 taps assembled along K) ----
        # A per-tap int32 `acc +=` chain spills the (4800, 128) accumulator
        # to VMEM on every tap (~90 ms/iter measured); assembling the 6
        # shifted frame views into one K-major scratch lets the MXU
        # accumulate internally. Stores normalize the mismatched sublane
        # offsets that a direct lane-concat rejects.
        for t, off in enumerate((0, 1, 50, 51, 100, 101)):
            lhs2_ref[:, pl.ds(128 * t, 128)] = \
                frame_ref[pl.ds(off, 4800), :]
        acc = jax.lax.dot_general(
            lhs2_ref[...], w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        of = jnp.clip(acc.astype(jnp.float32) * rs2 + bs2, 0.0, 127.0)
        # 2x2 maxpool in f32 (int8 max/adds don't legalize; max commutes
        # with the monotonic trunc-cast so pooling pre-cast is exact)
        of = of.reshape(48, 2, 50, 128)
        m = jnp.maximum(of[:, 0], of[:, 1])                # (48, 50, 128)
        # pooled col p = max(cell p's b1, cell p+1's b0); frame cell t packs
        # pooled cols (2t, 2t+1)
        mp = m.reshape(48, 25, 2, 128)
        ac = mp[:, :, 0, :]                                # even cells
        bc = mp[:, :, 1, :]                                # odd cells
        lo = jnp.maximum(ac[:, 0:24, 64:128], bc[:, 0:24, 0:64])
        hi = jnp.maximum(bc[:, 0:24, 64:128], ac[:, 1:25, 0:64])
        # lane-concat/pad reject the mismatched value layouts here; stores
        # through the pool scratch normalize them (borders zeroed above)
        pool_ref[:, 1:25, 0:64] = lo.astype(jnp.int8)
        pool_ref[:, 1:25, 64:128] = hi.astype(jnp.int8)
        out_ref[0, pl.ds(pc * OUT_ROWS + 26, 1248), :] = \
            pool_ref[...].reshape(1248, 128)

        # ---- zero border rows of the output frame ----
        out_ref[0, pl.ds(pc * OUT_ROWS, 26), :] = \
            jnp.zeros((26, 128), jnp.int8)
        out_ref[0, pl.ds(pc * OUT_ROWS + 1274, 38), :] = \
            jnp.zeros((38, 128), jnp.int8)


def make_block1_fn(qtree: dict, n_pr: int, n_pc: int,
                   interpret: bool | None = None):
    """Bind a ``tpusr.models.quant`` qtree into the fused
    patchify+b1c1+b1c2+pool kernel.

    Returns ``fn(img36) -> frames``: ``img36`` from ``build_img36*``;
    ``frames`` is ``(N * n_pr * n_pc, 1312, 128)`` int8 — the block-2
    even-paired input frames (patch order: image-major, then row, then col,
    matching the reference's patch enumeration).

    ``interpret``: run the kernel in the Pallas interpreter (defaults to
    True off-TPU so tests exercise it on the CPU mesh).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    l1 = qtree["layers"]["block1_conv1"]
    l2 = qtree["layers"]["block1_conv2"]
    w1 = jnp.asarray(pack_b1c1_img36(np.asarray(l1["kernel_q"])))
    w2 = jnp.asarray(
        pack_pair_taps_e2o(np.asarray(l2["kernel_q"])).reshape(768, 128))
    rs1 = jnp.asarray(np.tile(np.asarray(l1["rescale"]), 2))[None, :]
    bs1 = jnp.asarray(np.tile(np.asarray(l1["bias_over_out"]), 2))[None, :]
    rs2 = jnp.asarray(np.tile(np.asarray(l2["rescale"]), 2))[None, :]
    bs2 = jnp.asarray(np.tile(np.asarray(l2["bias_over_out"]), 2))[None, :]

    ry = 48 * (n_pr - 1) + 96
    ce = 24 * (n_pc - 1) + 48
    kern = functools.partial(_block1_kernel, n_pc=n_pc)
    vconst = pl.BlockSpec(memory_space=pltpu.VMEM)

    def fn(img36: jnp.ndarray) -> jnp.ndarray:
        n = img36.shape[0]
        assert img36.shape[1:] == (ry, ce * 128), img36.shape
        out = pl.pallas_call(
            kern,
            grid=(n, n_pr),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      vconst, vconst, vconst, vconst, vconst, vconst],
            out_specs=pl.BlockSpec(
                (1, n_pc * OUT_ROWS, 128),
                lambda i, j: (i * n_pr + j, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n * n_pr, n_pc * OUT_ROWS, 128), jnp.int8),
            scratch_shapes=[
                pltpu.VMEM((2, 96, ce * 128), jnp.int8),
                pltpu.VMEM((_FRAME_ROWS, 128), jnp.int8),
                pltpu.VMEM((4800, 768), jnp.int8),
                pltpu.VMEM((48, 26, 128), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(img36, w1, rs1, bs1, w2, rs2, bs2)
        return out.reshape(n * n_pr * n_pc, OUT_ROWS, 128)

    return fn


# ---------------------------------------------------------------------------
# XLA references (for tests)
# ---------------------------------------------------------------------------

def extract_patches_reference(img: jnp.ndarray, n_pr: int, n_pc: int,
                              patch: int = 96, stride: int = 48):
    """Reference patch extraction incl. bottom/right reflect padding:
    int8 (N, H, W, 3) -> (N*n_pr*n_pc, 96, 96, 3)."""
    n, h, w, _ = img.shape
    hp = stride * (n_pr - 1) + patch
    wp = stride * (n_pc - 1) + patch
    x = np.asarray(img)
    x = np.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="reflect")
    out = []
    for i in range(n):
        for r in range(n_pr):
            for c in range(n_pc):
                out.append(x[i, stride * r: stride * r + patch,
                             stride * c: stride * c + patch])
    return jnp.asarray(np.stack(out))


def block1_reference(qtree: dict, patches: jnp.ndarray) -> jnp.ndarray:
    """XLA reference for the kernel output: int8 patches (NP, 96, 96, 3) ->
    block-2 frames (NP, 1312, 128), with quant.py's exact conv/requant."""
    x = patches
    for name in ("block1_conv1", "block1_conv2"):
        layer = qtree["layers"][name]
        y = jax.lax.conv_general_dilated(
            x, layer["kernel_q"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * layer["rescale"] + layer["bias_over_out"]
        x = jnp.clip(yf, 0.0, 127.0).astype(jnp.int8)
    x = jax.lax.reduce_window(x, jnp.int8(-128), jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    np_ = x.shape[0]
    fr = jnp.pad(x.reshape(np_, 48, 24, 128),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    fr = fr.reshape(np_, 50 * 26, 128)
    return jnp.pad(fr, ((0, 0), (0, OUT_ROWS - 1300), (0, 0)))


def frames_to_pooled(frames: jnp.ndarray) -> jnp.ndarray:
    """Block-2 frames (NP, 1312, 128) -> plain pooled activations
    (NP, 48, 48, 64) (unpack helper for consumers/tests)."""
    np_ = frames.shape[0]
    v = frames[:, :1300, :].reshape(np_, 50, 26, 128)
    return v[:, 1:49, 1:25, :].reshape(np_, 48, 48, 64)

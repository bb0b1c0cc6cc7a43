"""One-off measurement: full-image ESRGAN SR (blockwise attention) on the
real chip vs the patch-based pipeline — the capability the dense HW^2
attention forbids (a 256x256-token map at the upsample site would need
~17 GB). Records numbers for PERF.md; not part of the driver bench.

Run: timeout 590 python bench_full_image.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from tpusr.models import ESRGANGenerator

HW = 128          # LR input (notebook-config generator, x2 -> 256x256 out)
BLOCK = 2048      # token block at both attention sites (16384 / 65536 tokens)
REPS = 8


def main():
    gen = ESRGANGenerator(scale_factor=2, growth_channels=8, num_rrdb_blocks=4,
                          attention_block_size=BLOCK)
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, HW, HW, 3), dtype=np.float32) * 2 - 1)
    v = jax.jit(gen.init)(jax.random.PRNGKey(0), x)
    v = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
    xb = x.astype(jnp.bfloat16)

    def chain(xin):
        def body(_, y):
            # data-dependent chaining so XLA cannot collapse the loop;
            # subsample the SR output back to the LR carry shape
            return gen.apply(v, jnp.clip(y, -1.0, 1.0))[:, ::2, ::2, :]
        return jax.lax.fori_loop(0, REPS, body, xin)

    fn = jax.jit(chain)
    hard_sync = lambda a: np.asarray(a[0, 0, 0, 0])
    out = fn(xb)
    hard_sync(out)  # compile + warm
    t0 = time.perf_counter()
    out = fn(xb)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"full-image ESRGAN x2 {HW}x{HW}->{2*HW}x{2*HW} "
          f"(blockwise attention, block={BLOCK}, bf16): {dt*1e3:.1f} ms/img "
          f"= {1.0/dt:.1f} img/s")

    # patch-based comparison at the reference patch geometry (48/24)
    from tpusr.pipeline.inference import _cached_sr_fn

    gen_p = ESRGANGenerator(scale_factor=2, growth_channels=8,
                            num_rrdb_blocks=4)
    vf = jax.tree.map(lambda a: a.astype(jnp.float32), v)
    apply_fn = lambda p: gen_p.apply(vf, p)
    pf = _cached_sr_fn(apply_fn, (HW, HW), 48, 24, 2, (-1.0, 1.0))
    img01 = (x[0] + 1) / 2  # f32: the bf16 overlap-add path trips a Mosaic
    # compiler bug ("Bad lhs type" on a bf16x bf16 -> f32 vector matmul)

    def pchain(xin):
        def body(_, y):
            sr = pf(jnp.clip(y, 0.0, 1.0))
            return sr[::2, ::2]  # back to LR size
        return jax.lax.fori_loop(0, REPS, body, xin)

    pfn = jax.jit(pchain)
    out = pfn(img01)
    np.asarray(out[0, 0, 0])
    t0 = time.perf_counter()
    out = pfn(img01)
    np.asarray(out[0, 0, 0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"patch-based ESRGAN x2 (48/24 overlap-add, dense attention, "
          f"f32): {dt*1e3:.1f} ms/img = {1.0/dt:.1f} img/s")

    # f32 full-image for the apples-to-apples comparison
    gen32 = gen.clone()
    def chain32(xin):
        def body(_, y):
            return gen32.apply(vf, jnp.clip(y, -1.0, 1.0))[:, ::2, ::2, :]
        return jax.lax.fori_loop(0, REPS, body, xin)
    f32fn = jax.jit(chain32)
    out = f32fn(x); hard_sync(out)
    t0 = time.perf_counter(); out = f32fn(x); hard_sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"full-image ESRGAN x2 (blockwise attention, f32): "
          f"{dt*1e3:.1f} ms/img = {1.0/dt:.1f} img/s")


if __name__ == "__main__":
    main()

"""Spatial (sequence-parallel analog) sharding: ring attention + full-image SR.

The reference bounds activation memory by decomposing images into patches
(``EDSR_model.py:214-256``) and its ESRGAN SelfAttention is dense HW^2
(``ESRGAN_model.py:48-70``) — quadratic in pixel count, the one piece that
limits full-image SR (SURVEY §5 "long-context / sequence parallelism").
The TPU-native answer built here:

- **Ring attention** (``make_ring_attention``): the token axis (HW) is
  sharded over a mesh axis; each device keeps its query block resident and
  streams the key/value blocks around the ring with ``jax.lax.ppermute``
  (ICI neighbor exchange), folding each block into the exact online-softmax
  recurrence — the shard_map twin of the single-device blockwise scan in
  ``tpusr.models.layers._streaming_attention``. Exact softmax attention
  (not an approximation): attention memory per device is
  O(HW/n_dev * block) and the dense (HW, HW) map never exists anywhere.
- **Spatially-sharded full-image SR** (``full_image_esrgan_sr``): the
  generator runs under jit with the image's H axis sharded over the mesh.
  XLA's SPMD partitioner inserts the conv halo exchanges automatically; the
  two attention sites run the ring. One H-sharded image in, one H-sharded
  SR image out — no patch decomposition, no overlap-add, exact generator
  semantics at sizes where neither the dense attention map nor a single
  device's activation memory would fit.

Both paths are bit-compatibility-tested against the dense single-device
generator on the virtual CPU mesh (tests/test_spatial.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_HI = jax.lax.Precision.HIGHEST


def make_ring_attention(mesh: Mesh, axis: str = "data"):
    """Build an ``attention_fn(gg, ff, hf) -> o`` running exact ring attention
    with tokens sharded over ``mesh`` axis ``axis``.

    gg/ff/hf are (B, N, d) query/key/value token tensors (the SelfAttention
    projections g/f/h — ``ESRGAN_model.py:48-70`` naming). N must be
    divisible by the mesh axis size. The returned function is jit-compatible
    and composes with XLA auto-partitioning (shard_map reshards its operands
    to the declared specs).
    """
    n_dev = mesh.shape[axis]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def _local(gq, fk, hv):
        # One shard: gq (B, N/n_dev, dk) stays resident; (fk, hv) blocks
        # rotate around the ring, one online-softmax fold per hop.
        b, nl, _ = gq.shape
        dv = hv.shape[-1]

        def fold(m, l, acc, f_blk, h_blk):
            s = jnp.einsum("bic,bjc->bij", gq, f_blk, precision=_HI)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            scale = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[..., None])
            l_new = l * scale + jnp.sum(p, axis=-1)
            acc_new = acc * scale[..., None] + jnp.einsum(
                "bij,bjc->bic", p, h_blk, precision=_HI)
            return m_new, l_new, acc_new

        def step(carry, _):
            m, l, acc, f_blk, h_blk = carry
            m, l, acc = fold(m, l, acc, f_blk, h_blk)
            # Neighbor exchange over ICI; n_dev blocks need only n_dev-1
            # hops — the last fold runs outside the scan, permute-free
            # (XLA cannot DCE a trailing collective inside a scan body).
            f_blk = jax.lax.ppermute(f_blk, axis, perm)
            h_blk = jax.lax.ppermute(h_blk, axis, perm)
            return (m, l, acc, f_blk, h_blk), None

        # Derive the init from the sharded operands so shard_map's
        # varying-axis typing matches the updated carry (a plain jnp.zeros
        # would be device-invariant and fail scan's carry type check).
        row = jnp.zeros_like(gq[..., 0])
        init = (row - jnp.inf, row,
                jnp.zeros_like(gq, shape=(b, nl, dv)) + row[..., None],
                fk, hv)
        carry = init
        if n_dev > 1:
            carry, _ = jax.lax.scan(step, init, None, length=n_dev - 1)
        m, l, acc = fold(*carry)
        return acc / l[..., None]

    token_spec = P(None, axis, None)
    sharded = jax.shard_map(_local, mesh=mesh,
                            in_specs=(token_spec,) * 3,
                            out_specs=token_spec)

    def attention_fn(gg, ff, hf):
        n = gg.shape[1]
        if n % n_dev:
            raise ValueError(
                f"ring attention: token count {n} not divisible by mesh "
                f"axis '{axis}' size {n_dev}")
        return sharded(gg, ff, hf)

    return attention_fn


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """(B, H, W, C) sharding with H split over the mesh axis."""
    return NamedSharding(mesh, P(None, axis))


@functools.lru_cache(maxsize=16)
def _full_image_sr_fn(gen, mesh: Mesh, axis: str):
    """Jitted H-sharded generator apply, cached per (generator config, mesh,
    axis) — flax modules hash by field values. jax.jit's own trace cache then
    keys on the argument shapes, so repeated calls over a dataset of
    same-shape images compile the generator graph once, not per image."""
    ring = make_ring_attention(mesh, axis)
    sharded_gen = gen.clone(attention_fn=ring, attention_block_size=None)
    in_sh = spatial_sharding(mesh, axis)
    rep = NamedSharding(mesh, P())
    jfn = jax.jit(sharded_gen.apply,
                  in_shardings=(rep, in_sh), out_shardings=in_sh)
    return jfn, in_sh


def full_image_esrgan_sr(gen, variables, img, mesh: Mesh, axis: str = "data"):
    """Run the ESRGAN generator on a FULL image, H-sharded over the mesh.

    ``gen`` is an ``ESRGANGenerator`` (its config is reused; attention is
    replaced by the ring). ``img`` is (B, H, W, C) in [-1, 1]; H (and hence
    the token counts at both attention sites) must be divisible by the mesh
    axis size. Returns the (B, H*scale, W*scale, C) SR image, H-sharded.

    Convs see the true neighboring rows across shard boundaries (XLA halo
    exchange), so the result equals the unsharded ``gen.apply`` exactly —
    asserted in tests/test_spatial.py.
    """
    n_dev = mesh.shape[axis]
    if img.shape[1] % n_dev:
        raise ValueError(
            f"full_image_esrgan_sr: H={img.shape[1]} not divisible by mesh "
            f"axis '{axis}' size {n_dev} (pad the image or pick a mesh "
            f"shape that divides H)")
    fn, in_sh = _full_image_sr_fn(gen, mesh, axis)
    return fn(variables, jax.device_put(img, in_sh))

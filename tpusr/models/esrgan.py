"""ESRGAN — RRDB generator with self-attention + spectral-norm discriminator.

Architecture parity with ``SRModels/deep_learning_models/ESRGAN_model.py``:
- Generator (:303-345): Conv64 -> N RRDB blocks (3 dense blocks of 5 convs with
  growth-channel concatenation, x0.2 residual scaling at both levels) -> trunk
  conv + skip -> SelfAttention(64) -> log2(scale) upsample blocks
  (Conv 256 -> pixel shuffle x2 -> LeakyReLU(0.2), SelfAttention after the
  first) -> Conv64 relu -> Conv(channels) tanh. Output range [-1, 1].
  Notebook config (growth 8, 4 RRDB, x2) = 1,162,915 params.
- Discriminator (:347-377): 6 spectrally-normalized convs
  (64 s1; then 64,64,128,128,256 / strides 2,1,2,1,2), LeakyReLU(0.2),
  GAP -> SN-Dense 256 -> SN-Dense 1 sigmoid. 658,305 params + 961 spectral u.
"""

from __future__ import annotations

import math
import typing

import jax.numpy as jnp
import flax.linen as nn

from tpusr.models.layers import SelfAttention, SNConv, SNDense, pixel_shuffle


class DenseBlock(nn.Module):
    """Five-conv dense block with growth-channel concatenation
    (ESRGAN_model.py:212-254)."""

    growth: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        g = self.growth
        x1 = nn.relu(nn.Conv(g, (3, 3), padding="SAME", name="conv1")(x))
        x2 = nn.relu(nn.Conv(g, (3, 3), padding="SAME", name="conv2")(
            jnp.concatenate([x, x1], -1)))
        x3 = nn.relu(nn.Conv(g, (3, 3), padding="SAME", name="conv3")(
            jnp.concatenate([x, x1, x2], -1)))
        x4 = nn.relu(nn.Conv(g, (3, 3), padding="SAME", name="conv4")(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = nn.Conv(in_ch, (3, 3), padding="SAME", name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x + 0.2 * x5


class RRDB(nn.Module):
    """Residual-in-residual dense block (ESRGAN_model.py:256-282)."""

    growth: int

    @nn.compact
    def __call__(self, x):
        y = DenseBlock(self.growth, name="dense1")(x)
        y = DenseBlock(self.growth, name="dense2")(y)
        y = DenseBlock(self.growth, name="dense3")(y)
        return x + 0.2 * y


class ESRGANGenerator(nn.Module):
    scale_factor: int = 2
    growth_channels: int = 32
    num_rrdb_blocks: int = 23
    channels: int = 3
    base_filters: int = 64
    # blockwise (online-softmax) attention: bounds activation memory at
    # O(HW * block) instead of the dense HW^2 map — full-image SR at sizes
    # where dense attention OOMs (SURVEY §5 long-context analog). Same
    # params/math; must divide the token count at each attention site.
    attention_block_size: int | None = None
    # full override of the attention inner computation (ring attention over
    # a sharded token axis — see tpusr.dist.spatial); same params/math.
    attention_fn: "typing.Callable | None" = None

    @nn.compact
    def __call__(self, x):
        f = self.base_filters
        trunk_in = nn.Conv(f, (3, 3), padding="SAME", name="initial_conv")(x)
        y = trunk_in
        for i in range(self.num_rrdb_blocks):
            y = RRDB(self.growth_channels, name=f"rrdb_{i}")(y)
        y = nn.Conv(f, (3, 3), padding="SAME", name="trunk_conv")(y)
        y = trunk_in + y
        y = SelfAttention(f, block_size=self.attention_block_size,
                          attention_fn=self.attention_fn,
                          name="self_attention_trunk")(y)

        num_up = int(math.log2(self.scale_factor))
        if 2 ** num_up != self.scale_factor:
            # fail loudly like EDSR does: int(log2(3)) == 1 would silently
            # build an x2 generator against x3 targets
            raise ValueError(
                f"ESRGANGenerator scale_factor must be a power of 2 "
                f"(log2(scale) upsample blocks, ESRGAN_model.py:327-339); "
                f"got {self.scale_factor}")
        for i in range(num_up):
            y = nn.Conv(f * 4, (3, 3), padding="SAME", name=f"upsample_{i}_conv")(y)
            y = pixel_shuffle(y, 2)
            y = nn.leaky_relu(y, negative_slope=0.2)
            if i == 0:
                y = SelfAttention(f, block_size=self.attention_block_size,
                                  attention_fn=self.attention_fn,
                                  name="self_attention_upsample_0")(y)

        y = nn.relu(nn.Conv(f, (3, 3), padding="SAME", name="final_conv1")(y))
        y = nn.Conv(self.channels, (3, 3), padding="SAME", name="final_conv2")(y)
        return jnp.tanh(y)


class ESRGANDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        y = SNConv(64, (3, 3), name="conv1")(x, update_stats)
        y = nn.leaky_relu(y, negative_slope=0.2)
        for i, (f, s) in enumerate(zip((64, 64, 128, 128, 256), (2, 1, 2, 1, 2))):
            y = SNConv(f, (3, 3), strides=(s, s), name=f"conv{i + 2}")(y, update_stats)
            y = nn.leaky_relu(y, negative_slope=0.2)
        y = jnp.mean(y, axis=(1, 2))  # GAP
        y = SNDense(256, name="dense1")(y, update_stats)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = SNDense(1, name="output")(y, update_stats)
        return nn.sigmoid(y)

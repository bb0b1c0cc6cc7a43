"""EDSR — Enhanced Deep Super-Resolution network (no batch norm).

Architecture parity with ``SRModels/deep_learning_models/EDSR_model.py:55-125``:
head Conv64(3x3) -> num_res_blocks x (Conv-relu-Conv, x res_scaling residual) ->
body Conv + global skip -> sub-pixel upsample tail (pixel shuffle; x2: one
block, x3: one, x4: two chained x2) -> Conv(channels) -> clip [0,1].
Default config (16 blocks, 64 filters, x2) = 1,369,859 parameters.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from tpusr.models.layers import pixel_shuffle

_HE = nn.initializers.he_normal()


class ResBlock(nn.Module):
    filters: int
    res_scaling: float

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=_HE,
                    name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", kernel_init=_HE,
                    name="conv2")(y)
        if self.res_scaling != 1.0:
            y = y * self.res_scaling
        return x + y


class EDSR(nn.Module):
    scale_factor: int = 2
    channels: int = 3
    num_res_blocks: int = 16
    num_filters: int = 64
    res_scaling: float = 0.1

    @nn.compact
    def __call__(self, x):
        if self.scale_factor not in (2, 3, 4):
            raise ValueError(f"scale factor {self.scale_factor} not supported")
        f = self.num_filters
        head = nn.Conv(f, (3, 3), padding="SAME", kernel_init=_HE, name="head")(x)
        y = head
        for i in range(self.num_res_blocks):
            y = ResBlock(f, self.res_scaling, name=f"res{i}")(y)
        y = nn.Conv(f, (3, 3), padding="SAME", kernel_init=_HE, name="body")(y)
        y = y + head

        if self.scale_factor in (2, 3):
            r = self.scale_factor
            y = nn.Conv(f * r * r, (3, 3), padding="SAME", kernel_init=_HE,
                        name="up0")(y)
            y = pixel_shuffle(y, r)
        else:  # x4 = two chained x2 blocks
            for i in range(2):
                y = nn.Conv(f * 4, (3, 3), padding="SAME", kernel_init=_HE,
                            name=f"up{i}")(y)
                y = pixel_shuffle(y, 2)

        y = nn.Conv(self.channels, (3, 3), padding="SAME", kernel_init=_HE,
                    name="tail")(y)
        return jnp.clip(y, 0.0, 1.0)

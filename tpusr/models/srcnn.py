"""SRCNN — three-conv super-resolution net.

Architecture parity with ``SRModels/deep_learning_models/SRCNN_model.py:45-53``:
Conv 96x(9,9) relu -> Conv 32x(1,1) relu -> Conv 3x(5,5) linear, all SAME.
Input is a pre-upscaled LR patch in [0,1]; 28,931 parameters.
"""

from __future__ import annotations

import flax.linen as nn


class SRCNN(nn.Module):
    channels: int = 3
    f1: int = 96
    f2: int = 32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.f1, (9, 9), padding="SAME", name="conv1")(x))
        x = nn.relu(nn.Conv(self.f2, (1, 1), padding="SAME", name="conv2")(x))
        return nn.Conv(self.channels, (5, 5), padding="SAME", name="conv3")(x)

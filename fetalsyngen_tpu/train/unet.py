"""3D segmentation UNet (flax.linen) — the downstream consumer model.

The reference ships no model (SURVEY §0: "no training loop, no model"); its
datasets feed an external trainer. To prove the end-to-end contract
(BASELINE config #5: "batched generation ... feeding a segmentation train
loop"), this module provides a compact 3D UNet whose convolutions run on the
MXU in bfloat16 with float32 accumulation.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), dtype=self.dtype, padding="SAME")(x)
            x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x)
            x = nn.silu(x)
        return x


class UNet3D(nn.Module):
    """Encoder-decoder with skip connections over (B, D, H, W, C) volumes."""

    channels: Sequence[int] = (16, 32, 64)
    n_classes: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        skips = []
        for ch in self.channels[:-1]:
            x = ConvBlock(ch, self.dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = ConvBlock(self.channels[-1], self.dtype)(x)
        for ch, skip in zip(reversed(self.channels[:-1]), reversed(skips)):
            x = nn.ConvTranspose(ch, (2, 2, 2), strides=(2, 2, 2), dtype=self.dtype)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(ch, self.dtype)(x)
        logits = nn.Conv(self.n_classes, (1, 1, 1), dtype=jnp.float32)(x)
        return logits.astype(jnp.float32)

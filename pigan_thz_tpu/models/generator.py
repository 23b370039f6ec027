"""Generators: spectrum (250) -> normalized structural params (4), tanh head.

Variants (reference files under /root/reference/core/models/):
- MLPGenerator        — baseline: 250->512->256->4, BatchNorm+ReLU, Tanh
                        (generator.py:17-26);
- ConvAttnGenerator   — Conv1d pyramid + optional 8-head self-attention +
                        deep FC head (enhanced_generator.py:7-102);
- ResidualGenerator   — input projection + N residual blocks + FC head
                        (enhanced_generator.py:125-170).

All end in tanh so predicted params live in [-1, 1] like the dataset's
normalized parameters (data_loader.py:193-194).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvStack1D, MLPBlock, ResidualBlock, SelfAttention


class MLPGenerator(nn.Module):
    output_dim: int = 4
    hidden_dims: Sequence[int] = (512, 256)
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, spectrum: jax.Array, train: bool = False) -> jax.Array:
        x = spectrum.reshape(spectrum.shape[0], -1)
        for h in self.hidden_dims:
            x = MLPBlock(
                h, norm=self.norm, act="relu", dtype=self.dtype, axis_name=self.axis_name
            )(x, train=train)
        x = nn.Dense(self.output_dim, dtype=self.dtype)(x)
        return jnp.tanh(x)


class ConvAttnGenerator(nn.Module):
    output_dim: int = 4
    use_attention: bool = True
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, spectrum: jax.Array, train: bool = False) -> jax.Array:
        x = spectrum.reshape(spectrum.shape[0], -1)
        tokens = ConvStack1D(
            pool_to=32, norm=self.norm, dtype=self.dtype, axis_name=self.axis_name
        )(x, train=train)                                  # (B, 32, 256)
        if self.use_attention:
            tokens = SelfAttention(num_heads=8, dtype=self.dtype)(tokens, train=train)
        h = tokens.reshape(tokens.shape[0], -1)            # (B, 32*256)
        for feat, drop in ((1024, 0.3), (512, 0.3), (256, 0.2), (128, 0.2)):
            h = MLPBlock(
                feat,
                norm=self.norm,
                act="relu",
                dropout_rate=drop,
                dtype=self.dtype,
                axis_name=self.axis_name,
            )(h, train=train)
        h = nn.Dense(self.output_dim, dtype=self.dtype)(h)
        return jnp.tanh(h)


class ResidualGenerator(nn.Module):
    output_dim: int = 4
    num_residual_blocks: int = 3
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, spectrum: jax.Array, train: bool = False) -> jax.Array:
        x = spectrum.reshape(spectrum.shape[0], -1)
        x = MLPBlock(512, norm=self.norm, act="relu", dtype=self.dtype,
                     axis_name=self.axis_name)(x, train=train)
        for _ in range(self.num_residual_blocks):
            x = ResidualBlock(512, norm=self.norm, dtype=self.dtype,
                              axis_name=self.axis_name)(x, train=train)
        for feat, drop in ((256, 0.3), (128, 0.2)):
            x = MLPBlock(
                feat, norm=self.norm, act="relu", dropout_rate=drop,
                dtype=self.dtype, axis_name=self.axis_name,
            )(x, train=train)
        x = nn.Dense(self.output_dim, dtype=self.dtype)(x)
        return jnp.tanh(x)

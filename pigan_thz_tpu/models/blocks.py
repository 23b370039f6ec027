"""Shared building blocks for the PI-GAN model zoo (flax.linen).

Design notes (TPU-first):
- All dense layers take a ``dtype`` so activations/matmuls can run in
  bfloat16 on the MXU while parameters stay float32 (``param_dtype``).
- Torch's ``AdaptiveAvgPool1d`` (enhanced_generator.py:35) is reformulated as
  a constant pooling matrix matmul — static shapes, MXU-friendly, and exactly
  reproduces torch's floor/ceil bin edges.
- BatchNorm carries mutable ``batch_stats`` (torch momentum 0.1 ==
  flax momentum 0.9); the generator config can swap it for LayerNorm, which
  needs no cross-device stat sync under data parallelism (SURVEY §7 risk
  "BatchNorm in G under pjit").  When BatchNorm is used under a sharded batch
  axis, pass ``axis_name`` so stats are psum-reduced over the mesh.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def adaptive_avg_pool_matrix(in_len: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) averaging matrix with torch AdaptiveAvgPool1d bins:
    bin i spans [floor(i*L/out), ceil((i+1)*L/out))."""
    m = np.zeros((out_len, in_len), dtype=np.float32)
    for i in range(out_len):
        start = (i * in_len) // out_len
        end = -(-((i + 1) * in_len) // out_len)  # ceil division
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool1d(x: jax.Array, out_len: int) -> jax.Array:
    """x: (..., L, C) -> (..., out_len, C) via constant-matrix contraction."""
    in_len = x.shape[-2]
    mat = jnp.asarray(adaptive_avg_pool_matrix(in_len, out_len), x.dtype)
    return jnp.einsum("ol,...lc->...oc", mat, x)


class NormAct(nn.Module):
    """Norm + activation pair used throughout the model zoo."""

    norm: str = "batch"          # batch|layer|none
    act: str = "relu"            # relu|leaky_relu|none
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
            )(x)
        elif self.norm == "layer":
            x = nn.LayerNorm(dtype=self.dtype)(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "leaky_relu":
            x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        return x


class MLPBlock(nn.Module):
    """Dense -> norm -> activation -> dropout.  The five-times-repeated motif
    of the reference forward model (forward_model.py:28-60)."""

    features: int
    norm: str = "layer"
    act: str = "leaky_relu"
    leaky_slope: float = 0.2
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = NormAct(
            norm=self.norm,
            act=self.act,
            leaky_slope=self.leaky_slope,
            dtype=self.dtype,
            axis_name=self.axis_name,
        )(x, train=train)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class SpectralDense(nn.Module):
    """Dense layer with optional spectral normalization
    (enhanced_discriminator.py:63-69 applies torch spectral_norm to every
    Linear).  Uses flax's power-iteration SpectralNorm wrapper."""

    features: int
    use_spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dense = nn.Dense(self.features, dtype=self.dtype)
        if self.use_spectral_norm:
            return nn.SpectralNorm(dense)(x, update_stats=train)
        return dense(x)


class ResidualBlock(nn.Module):
    """Linear-BN-ReLU-Dropout-Linear-BN + skip, ReLU after add
    (enhanced_generator.py:104-123)."""

    features: int
    dropout_rate: float = 0.2
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.Dense(self.features, dtype=self.dtype)(x)
        y = NormAct(norm=self.norm, act="relu", dtype=self.dtype, axis_name=self.axis_name)(
            y, train=train
        )
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.Dense(self.features, dtype=self.dtype)(y)
        y = NormAct(norm=self.norm, act="none", dtype=self.dtype, axis_name=self.axis_name)(
            y, train=train
        )
        return nn.relu(x + y)


class ConvStack1D(nn.Module):
    """Conv1d feature pyramid from the enhanced models
    (enhanced_generator.py:18-36 / enhanced_discriminator.py:97-110):
    channels 1->64->128->256 with kernels 7/5/3, max-pool /2 between stages,
    adaptive average pool to ``pool_to`` tokens."""

    channels: Sequence[int] = (64, 128, 256)
    kernels: Sequence[int] = (7, 5, 3)
    pool_to: int = 32
    norm: str = "batch"            # generator uses BN; discriminator none
    act: str = "relu"
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, L) -> (B, L, 1) channels-last for flax Conv
        h = x[..., None]
        n = len(self.channels)
        for i, (ch, k) in enumerate(zip(self.channels, self.kernels)):
            h = nn.Conv(ch, kernel_size=(k,), padding="SAME", dtype=self.dtype)(h)
            h = NormAct(
                norm=self.norm,
                act=self.act,
                leaky_slope=self.leaky_slope,
                dtype=self.dtype,
                axis_name=self.axis_name,
            )(h, train=train)
            if i < n - 1:
                h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        return adaptive_avg_pool1d(h, self.pool_to)   # (B, pool_to, C)


class SelfAttention(nn.Module):
    """Multi-head self-attention over pooled spectral tokens
    (enhanced_generator.py:42-48: embed 256, 8 heads, dropout 0.1)."""

    num_heads: int = 8
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
            dtype=self.dtype,
        )(x, x)

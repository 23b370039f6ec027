"""Discriminators: (spectrum, physical params) -> real/fake score.

All variants return LOGITS (pre-sigmoid).  The reference ends every
discriminator in ``nn.Sigmoid`` and trains with ``nn.BCELoss``
(discriminator.py:27, loss.py:8-17); logits + ``bce_logits`` is the
numerically identical, TPU-stable formulation.  Use
``jax.nn.sigmoid(logits)`` wherever the reference consumes probabilities
(e.g. accuracy-at-0.5 in unified_evaluator.py:315-317).

Variants (reference files under /root/reference/core/models/):
- MLPDiscriminator        — baseline concat MLP 254->512->256->1,
                            LeakyReLU(0.2) (discriminator.py:21-28);
- DualEncoderDiscriminator— split spectrum/param encoders + fusion MLP with
                            optional spectral norm
                            (enhanced_discriminator.py:10-88);
- ConvDiscriminator       — Conv1d spectrum tower + param MLP + classifier
                            (enhanced_discriminator.py:90-163);
- MultiScaleDiscriminator — full + half-scale dual-encoder discriminators,
                            score fusion (enhanced_discriminator.py:165-200).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvStack1D, SpectralDense


def _flatten(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


class MLPDiscriminator(nn.Module):
    hidden_dims: Sequence[int] = (512, 256)
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, spectrum: jax.Array, params: jax.Array, train: bool = False
    ) -> jax.Array:
        x = jnp.concatenate([_flatten(spectrum), _flatten(params)], axis=-1)
        for h in self.hidden_dims:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        return nn.Dense(1, dtype=self.dtype)(x)


class _Encoder(nn.Module):
    """LeakyReLU+Dropout dense stack with optional spectral norm."""

    dims: Sequence[int]
    drops: Sequence[float]
    use_spectral_norm: bool = False
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for h, d in zip(self.dims, self.drops):
            x = SpectralDense(h, self.use_spectral_norm, dtype=self.dtype)(x, train=train)
            x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
            if d > 0:
                x = nn.Dropout(d, deterministic=not train)(x)
        return x


class DualEncoderDiscriminator(nn.Module):
    use_spectral_norm: bool = True
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, spectrum: jax.Array, params: jax.Array, train: bool = False
    ) -> jax.Array:
        sn = self.use_spectral_norm
        spec_feat = _Encoder(
            (512, 256, 128), (0.3, 0.3, 0.2), sn, self.leaky_slope, self.dtype
        )(_flatten(spectrum), train=train)
        par_feat = _Encoder(
            (64, 32), (0.3, 0.2), sn, self.leaky_slope, self.dtype
        )(_flatten(params), train=train)
        x = jnp.concatenate([spec_feat, par_feat], axis=-1)
        x = _Encoder(
            (256, 128, 64), (0.4, 0.3, 0.2), sn, self.leaky_slope, self.dtype
        )(x, train=train)
        return SpectralDense(1, sn, dtype=self.dtype)(x, train=train)


class ConvDiscriminator(nn.Module):
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, spectrum: jax.Array, params: jax.Array, train: bool = False
    ) -> jax.Array:
        tokens = ConvStack1D(
            pool_to=16, norm="none", act="leaky_relu",
            leaky_slope=self.leaky_slope, dtype=self.dtype,
        )(_flatten(spectrum), train=train)              # (B, 16, 256)
        spec_feat = tokens.reshape(tokens.shape[0], -1)
        par_feat = _Encoder((64, 32), (0.3, 0.2), False, self.leaky_slope, self.dtype)(
            _flatten(params), train=train
        )
        x = jnp.concatenate([spec_feat, par_feat], axis=-1)
        x = _Encoder(
            (512, 256, 128), (0.4, 0.3, 0.2), False, self.leaky_slope, self.dtype
        )(x, train=train)
        return nn.Dense(1, dtype=self.dtype)(x)


class MultiScaleDiscriminator(nn.Module):
    use_spectral_norm: bool = True
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, spectrum: jax.Array, params: jax.Array, train: bool = False
    ) -> jax.Array:
        spec = _flatten(spectrum)
        full = DualEncoderDiscriminator(
            self.use_spectral_norm, self.leaky_slope, self.dtype, name="full_scale"
        )(spec, params, train=train)
        # avg_pool1d(kernel=2) downsample (enhanced_discriminator.py:194)
        half_len = spec.shape[-1] // 2
        half = jnp.mean(spec[:, : half_len * 2].reshape(spec.shape[0], half_len, 2), axis=-1)
        half_out = DualEncoderDiscriminator(
            self.use_spectral_norm, self.leaky_slope, self.dtype, name="half_scale"
        )(half, params, train=train)
        # The reference fuses the two (post-sigmoid) scores with a tiny MLP
        # (enhanced_discriminator.py:176-182); we fuse the probabilities and
        # return a fused logit.
        scores = jnp.concatenate(
            [jax.nn.sigmoid(full), jax.nn.sigmoid(half_out)], axis=-1
        )
        x = nn.Dense(64, dtype=self.dtype)(scores)
        x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        return nn.Dense(1, dtype=self.dtype)(x)

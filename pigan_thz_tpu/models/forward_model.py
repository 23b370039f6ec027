"""Forward surrogates: normalized params (4) -> (spectrum 250, metrics 8).

Variants (reference files under /root/reference/core/models/):
- ForwardMLP              — baseline 4->256->512->1024->512->256->(250+8),
                            LayerNorm+LeakyReLU(0.2)+Dropout(0.2) per block,
                            linear split head (forward_model.py:28-76);
- BranchedForwardModel    — shared encoder + separate spectrum/metrics
                            branches (enhanced_forward_model.py:7-85);
- PhysicsForwardModel     — param embedding -> physics encoder ->
                            single-token self-attention -> dual heads
                            (enhanced_forward_model.py:87-181);
- UncertaintyForwardModel — mean + Softplus-variance heads with MC sampling
                            (enhanced_forward_model.py:224-289).

Dropout doubles as MC-dropout uncertainty (forward_model.py:33): call with
``train=True`` and distinct rngs to draw stochastic forward passes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import MLPBlock, SelfAttention


class ForwardMLP(nn.Module):
    spectrum_dim: int = 250
    metrics_dim: int = 8
    hidden_dims: Sequence[int] = (256, 512, 1024, 512, 256)
    dropout_rate: float = 0.2
    leaky_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, params_norm: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        x = params_norm
        for h in self.hidden_dims:
            x = MLPBlock(
                h,
                norm="layer",
                act="leaky_relu",
                leaky_slope=self.leaky_slope,
                dropout_rate=self.dropout_rate,
                dtype=self.dtype,
            )(x, train=train)
        out = nn.Dense(self.spectrum_dim + self.metrics_dim, dtype=self.dtype)(x)
        return out[..., : self.spectrum_dim], out[..., self.spectrum_dim :]


class BranchedForwardModel(nn.Module):
    spectrum_dim: int = 250
    metrics_dim: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, params_norm: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        x = params_norm
        for h in (128, 256, 512):
            x = MLPBlock(h, norm="layer", act="relu", dropout_rate=0.2,
                         dtype=self.dtype)(x, train=train)
        spec = x
        for h, d in ((1024, 0.3), (2048, 0.3), (1024, 0.2)):
            spec = MLPBlock(h, norm="layer", act="relu", dropout_rate=d,
                            dtype=self.dtype)(spec, train=train)
        spec = nn.Dense(self.spectrum_dim, dtype=self.dtype)(spec)
        met = x
        for h, d in ((256, 0.2), (128, 0.2), (64, 0.1)):
            met = MLPBlock(h, norm="layer", act="relu", dropout_rate=d,
                           dtype=self.dtype)(met, train=train)
        met = nn.Dense(self.metrics_dim, dtype=self.dtype)(met)
        return spec, met


class PhysicsForwardModel(nn.Module):
    spectrum_dim: int = 250
    metrics_dim: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, params_norm: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        x = params_norm
        for h in (64, 128):
            x = MLPBlock(h, norm="layer", act="relu", dtype=self.dtype)(x, train=train)
        for h in (256, 512):
            x = MLPBlock(h, norm="layer", act="relu", dropout_rate=0.2,
                         dtype=self.dtype)(x, train=train)
        # single-token self-attention (enhanced_forward_model.py:156-175)
        tok = x[:, None, :]
        tok = SelfAttention(num_heads=8, dtype=self.dtype)(tok, train=train)
        x = tok[:, 0, :]
        spec = x
        for h, d in ((1024, 0.3), (2048, 0.3), (1024, 0.2)):
            spec = MLPBlock(h, norm="layer", act="relu", dropout_rate=d,
                            dtype=self.dtype)(spec, train=train)
        spec = nn.Dense(self.spectrum_dim, dtype=self.dtype)(spec)
        met = x
        for h, d in ((256, 0.2), (128, 0.2)):
            met = MLPBlock(h, norm="layer", act="relu", dropout_rate=d,
                           dtype=self.dtype)(met, train=train)
        met = nn.Dense(self.metrics_dim, dtype=self.dtype)(met)
        return spec, met


class UncertaintyForwardModel(nn.Module):
    """Returns (spec_mean, met_mean, spec_var, met_var); variances via
    Softplus.  The reference returns only the means in train mode
    (enhanced_forward_model.py:258-265); here the arity is mode-independent
    and training consumers index out[0]/out[1] (train.steps._apply
    boundary), so this variant trains like any other — and
    ForwardStepSettings.nll_w > 0 additionally trains the variance heads
    with a heteroscedastic Gaussian NLL (beyond the reference, which never
    trains them)."""

    spectrum_dim: int = 250
    metrics_dim: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, params_norm: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        x = params_norm
        for h in (256, 512, 1024):
            x = MLPBlock(h, norm="layer", act="relu", dropout_rate=0.2,
                         dtype=self.dtype)(x, train=train)
        sm = MLPBlock(2048, norm="layer", act="relu", dropout_rate=0.3,
                      dtype=self.dtype)(x, train=train)
        spec_mean = nn.Dense(self.spectrum_dim, dtype=self.dtype)(sm)
        sv = MLPBlock(1024, norm="layer", act="relu", dropout_rate=0.2,
                      dtype=self.dtype)(x, train=train)
        spec_var = nn.softplus(nn.Dense(self.spectrum_dim, dtype=self.dtype)(sv))
        mm = MLPBlock(256, norm="layer", act="relu", dropout_rate=0.2,
                      dtype=self.dtype)(x, train=train)
        met_mean = nn.Dense(self.metrics_dim, dtype=self.dtype)(mm)
        mv = MLPBlock(128, norm="layer", act="relu", dropout_rate=0.1,
                      dtype=self.dtype)(x, train=train)
        met_var = nn.softplus(nn.Dense(self.metrics_dim, dtype=self.dtype)(mv))
        return spec_mean, met_mean, spec_var, met_var


def mc_dropout_predict(
    model,
    variables,
    params_norm: jax.Array,
    key: jax.Array,
    num_samples: int = 100,
):
    """MC-dropout uncertainty for any dropout-bearing forward model
    (forward_model.py:33: "Dropout 层进行不确定性建模"): run `num_samples`
    stochastic forward passes (train=True, distinct dropout rngs) and return
    (spectrum_mean, spectrum_std, metrics_mean, metrics_std).  Vmapped over
    samples — one batched XLA program instead of a Python loop."""

    def draw(k):
        out = model.apply(variables, params_norm, train=True, rngs={"dropout": k})
        return out[0], out[1]

    specs, mets = jax.vmap(draw)(jax.random.split(key, num_samples))
    return (
        jnp.mean(specs, axis=0),
        jnp.std(specs, axis=0),
        jnp.mean(mets, axis=0),
        jnp.std(mets, axis=0),
    )


def sample_predictions(
    model: UncertaintyForwardModel,
    variables,
    params_norm: jax.Array,
    key: jax.Array,
    num_samples: int = 100,
):
    """Monte-Carlo sampling from the predictive Gaussian
    (enhanced_forward_model.py:267-289) — vmapped over samples instead of a
    Python loop."""
    spec_mean, met_mean, spec_var, met_var = model.apply(variables, params_norm)

    def draw(k):
        k1, k2 = jax.random.split(k)
        s = spec_mean + jnp.sqrt(spec_var) * jax.random.normal(k1, spec_mean.shape)
        m = met_mean + jnp.sqrt(met_var) * jax.random.normal(k2, met_mean.shape)
        return s, m

    return jax.vmap(draw)(jax.random.split(key, num_samples))

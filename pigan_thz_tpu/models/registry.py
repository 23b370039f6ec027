"""Model registry: config name -> flax module constructor.

Gives the framework the same pluggability the reference gets from importing
one of eight model classes by hand across its trainers (SURVEY §2.3 rows
6-11), behind a single factory keyed by the config dataclasses.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import DiscriminatorConfig, ForwardModelConfig, GeneratorConfig, PiGanConfig
from .discriminator import (
    ConvDiscriminator,
    DualEncoderDiscriminator,
    MLPDiscriminator,
    MultiScaleDiscriminator,
)
from .forward_model import (
    BranchedForwardModel,
    ForwardMLP,
    PhysicsForwardModel,
    UncertaintyForwardModel,
)
from .generator import ConvAttnGenerator, MLPGenerator, ResidualGenerator


def _dtype(name: str) -> jnp.dtype:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def build_generator(
    cfg: GeneratorConfig, dtype: str = "float32", axis_name: str | None = None
) -> nn.Module:
    dt = _dtype(dtype)
    if cfg.name == "mlp":
        return MLPGenerator(
            hidden_dims=tuple(cfg.hidden_dims), norm=cfg.norm, dtype=dt, axis_name=axis_name
        )
    if cfg.name == "conv_attn":
        return ConvAttnGenerator(
            use_attention=cfg.use_attention, norm=cfg.norm, dtype=dt, axis_name=axis_name
        )
    if cfg.name == "residual":
        return ResidualGenerator(
            num_residual_blocks=cfg.num_residual_blocks,
            norm=cfg.norm,
            dtype=dt,
            axis_name=axis_name,
        )
    raise ValueError(f"unknown generator: {cfg.name!r}")


def build_discriminator(cfg: DiscriminatorConfig, dtype: str = "float32") -> nn.Module:
    dt = _dtype(dtype)
    if cfg.name == "mlp":
        return MLPDiscriminator(
            hidden_dims=tuple(cfg.hidden_dims), leaky_slope=cfg.leaky_slope, dtype=dt
        )
    if cfg.name == "dual_encoder":
        return DualEncoderDiscriminator(
            use_spectral_norm=cfg.use_spectral_norm,
            leaky_slope=cfg.leaky_slope,
            dtype=dt,
        )
    if cfg.name == "conv":
        return ConvDiscriminator(leaky_slope=cfg.leaky_slope, dtype=dt)
    if cfg.name == "multi_scale":
        return MultiScaleDiscriminator(
            use_spectral_norm=cfg.use_spectral_norm,
            leaky_slope=cfg.leaky_slope,
            dtype=dt,
        )
    raise ValueError(f"unknown discriminator: {cfg.name!r}")


def build_forward_model(
    cfg: ForwardModelConfig, spectrum_dim: int = 250, metrics_dim: int = 8,
    dtype: str = "float32",
) -> nn.Module:
    dt = _dtype(dtype)
    common = dict(spectrum_dim=spectrum_dim, metrics_dim=metrics_dim, dtype=dt)
    if cfg.name == "mlp":
        return ForwardMLP(
            hidden_dims=tuple(cfg.hidden_dims),
            dropout_rate=cfg.dropout_rate,
            leaky_slope=cfg.leaky_slope,
            **common,
        )
    if cfg.name == "branched":
        return BranchedForwardModel(**common)
    if cfg.name == "physics":
        return PhysicsForwardModel(**common)
    if cfg.name == "uncertainty":
        return UncertaintyForwardModel(**common)
    raise ValueError(f"unknown forward model: {cfg.name!r}")


def build_trio(cfg: PiGanConfig, axis_name: str | None = None):
    """Build (generator, discriminator, forward_model) from the run config."""
    dt = cfg.train.compute_dtype
    g = build_generator(cfg.generator, dtype=dt, axis_name=axis_name)
    d = build_discriminator(cfg.discriminator, dtype=dt)
    f = build_forward_model(
        cfg.forward_model,
        spectrum_dim=cfg.data.spectrum_dim,
        metrics_dim=cfg.data.metrics_dim,
        dtype=dt,
    )
    return g, d, f

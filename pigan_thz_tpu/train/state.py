"""Train state: one pytree holding the whole training world.

The reference scatters training state across three torch modules, two or
three optimizers, two schedulers, and Python-side history dicts
(train_pigan.py:56-88, unified_constraint_trainer.py:1114-1138).  Here it is
a single `PiGanState` pytree — jit-donatable, orbax-checkpointable, and
shardable over a mesh in one annotation pass.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import PiGanConfig
from .schedules import build_optimizer


@struct.dataclass
class ModelState:
    """Variables of one flax module, split into trainable params and
    auxiliary collections (batch_stats, spectral-norm u-vectors, ...)."""

    params: Any
    extra: Any  # dict of non-param collections; {} if none

    @property
    def variables(self) -> dict:
        return {"params": self.params, **self.extra}

    @classmethod
    def from_variables(cls, variables) -> "ModelState":
        variables = dict(variables)
        params = variables.pop("params")
        return cls(params=params, extra=variables)


@struct.dataclass
class PiGanState:
    """Full GAN training state (G + D + frozen F + both optimizers + PRNG).

    `g_ema` optionally carries an exponential moving average of the
    generator params (`StepSettings.ema_decay` > 0) — the standard GAN
    inference-quality trick, updated inside the fused step as a pytree lerp.
    It defaults to None (an empty pytree subtree), so states trained without
    EMA keep the exact leaf structure of earlier revisions and old
    checkpoints restore unchanged."""

    step: jax.Array
    rng: jax.Array
    g: ModelState
    d: ModelState
    f: ModelState
    g_opt: optax.OptState
    d_opt: optax.OptState
    g_ema: Any = None


@struct.dataclass
class ForwardState:
    """Forward-surrogate pretraining state."""

    step: jax.Array
    rng: jax.Array
    f: ModelState
    opt: optax.OptState


def init_forward_state(
    model, tx: optax.GradientTransformation, rng: jax.Array, param_dim: int = 4
) -> ForwardState:
    k_init, k_state = jax.random.split(rng)
    dummy = jnp.zeros((2, param_dim), jnp.float32)
    variables = model.init({"params": k_init, "dropout": k_init}, dummy, train=False)
    f = ModelState.from_variables(variables)
    return ForwardState(
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
        f=f,
        opt=tx.init(f.params),
    )


def init_pigan_state(
    generator,
    discriminator,
    forward_model,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    rng: jax.Array,
    spectrum_dim: int = 250,
    param_dim: int = 4,
    forward_variables=None,
    ema: bool = False,
) -> PiGanState:
    """Initialize G/D (fresh) and F (fresh or from pretraining).  With
    `ema=True` the state also carries an EMA copy of the generator params
    (seeded at the init values) for `StepSettings.ema_decay` training."""
    kg, kd, kf, k_state = jax.random.split(rng, 4)
    spec = jnp.zeros((2, spectrum_dim), jnp.float32)
    par = jnp.zeros((2, param_dim), jnp.float32)

    g_vars = generator.init({"params": kg, "dropout": kg}, spec, train=False)
    d_vars = discriminator.init({"params": kd, "dropout": kd}, spec, par, train=False)
    if forward_variables is None:
        forward_variables = forward_model.init(
            {"params": kf, "dropout": kf}, par, train=False
        )
    else:
        # Deep-copy: epoch loops donate the GAN state, which would otherwise
        # invalidate buffers shared with the caller's pretrain state.
        forward_variables = jax.tree.map(jnp.copy, forward_variables)

    g = ModelState.from_variables(g_vars)
    d = ModelState.from_variables(d_vars)
    f = ModelState.from_variables(forward_variables)
    return PiGanState(
        step=jnp.zeros((), jnp.int32),
        rng=k_state,
        g=g,
        d=d,
        f=f,
        g_opt=g_tx.init(g.params),
        d_opt=d_tx.init(d.params),
        g_ema=jax.tree.map(jnp.copy, g.params) if ema else None,
    )


def make_optimizers(cfg: PiGanConfig, steps_per_epoch: int):
    """(g_tx, d_tx, f_tx) from the run config, reproducing the reference's
    scheduler pairing: cosine for G, step-decay for D, cosine for F."""
    epochs = cfg.train.num_epochs
    g_tx = build_optimizer(
        lr=cfg.train.lr_g,
        total_epochs=epochs,
        steps_per_epoch=steps_per_epoch,
        schedule="cosine",
        b1=0.5,
        grad_clip=cfg.train.grad_clip,
        adam_state_dtype=cfg.train.adam_state_dtype,
    )
    d_tx = build_optimizer(
        lr=cfg.train.lr_d,
        total_epochs=epochs,
        steps_per_epoch=steps_per_epoch,
        schedule="step",
        b1=0.5,
        grad_clip=cfg.train.grad_clip,
        adam_state_dtype=cfg.train.adam_state_dtype,
    )
    f_tx = build_optimizer(
        lr=cfg.train.fwd_pretrain_lr,
        total_epochs=cfg.train.fwd_pretrain_epochs,
        steps_per_epoch=steps_per_epoch,
        schedule="cosine",
        b1=0.9,
        grad_clip=cfg.train.grad_clip,
        schedule_alpha=0.0,   # torch CosineAnnealingLR default eta_min=0
        adam_state_dtype=cfg.train.adam_state_dtype,
    )
    return g_tx, d_tx, f_tx

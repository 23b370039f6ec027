"""Fused, jitted training steps.

The reference's hot loop (train_pigan.py:114-187) is a Python-side sequence:
D forward x2, D backward, D Adam step, G forward, F forward, six loss terms,
G backward, G Adam step — dozens of small kernel launches per batch.  Here
the ENTIRE alternating D-then-G update (with G reading D's just-updated
weights, matching the reference's sequential semantics) is ONE XLA program,
and a whole epoch runs as one `lax.scan` over a shuffled index matrix with
zero host synchronization.

TPU-specific choices:
- D is evaluated on the concatenated [real; fake] batch -> one (2B, .) matmul
  chain instead of two (B, .) chains (better MXU tiling).  The summed
  real+fake BCE of the reference equals 2x the mean over the concat batch.
- D outputs logits; BCE-with-logits replaces Sigmoid+BCELoss (identical
  math, stable in bf16).
- `detach_forward=True` reproduces the reference's `torch.no_grad()` around
  the frozen forward model (train_pigan.py:156-157) — physics losses then
  carry no gradient into G; set False for the unified-trainer behaviour
  (unified_trainer.py:240-256) where gradients flow *through* frozen F.

One `StepSettings` covers every reference trainer variant:
train_pigan.py (base), unified_trainer.py (constraint/physics/stability),
unified_constraint_trainer.py (enhanced constraint + annealing + cycle),
constraint_optimizer.py (sigmoid squash, reduced D frequency),
emergency_trainer.py (adv down-weight, D every k batches, warmup).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import PiGanConfig
from ..data.dataset import ThzDataset, denormalize_params, epoch_indices, gather_batch
from ..ops import losses as L
from .state import ForwardState, ModelState, PiGanState

Batch = Tuple[jax.Array, ...]  # (spectra, params, params_norm, metrics, metrics_norm)


# ---------------------------------------------------------------------------
# Static step settings
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StepSettings:
    """Static (compile-time) knobs of the fused GAN step."""

    # loss weights (config/config.py:79-88 defaults)
    adv_w: float = 1.0
    recon_w: float = 100.0
    physics_spec_w: float = 10.0
    physics_metrics_w: float = 1.0
    maxwell_w: float = 1.0
    lc_w: float = 1.0
    range_w: float = 0.1
    kl_w: float = 0.0
    # extended trainer losses (0 = off)
    constraint_w: float = 0.0        # enhanced constraint loss
    stability_w: float = 0.0         # input-noise stability
    cycle_w: float = 0.0             # cycle consistency G(F(G(s))) ~ G(s)
    window_w: float = 0.0            # physics resonance-window loss
    # semantics
    detach_forward: bool = True
    sigmoid_squash: bool = False     # constraint_optimizer.py:246
    label_real: float = 0.9          # label smoothing (train_pigan.py:127)
    label_fake: float = 0.1
    range_lo: float = 0.0            # parity: [0,1] window on tanh outputs
    range_hi: float = 1.0
    d_update_every: int = 1          # D update frequency (emergency_trainer.py:64-83)
    stability_noise: float = 0.01    # unified_trainer.py:260
    # EMA of generator params (0 = off).  New capability (no reference
    # counterpart): evaluate/serve with state.g_ema for a smoother G.
    ema_decay: float = 0.0
    # GAN objective: "bce" (reference, Sigmoid+BCELoss) or "wgan_gp" —
    # declared in the reference's overlay (training_optimization.py:72-74)
    # but never implemented there; real here.
    gan_loss: str = "bce"
    gp_weight: float = 10.0
    # D-input instance noise (training_optimization.py:71), 0 = off
    instance_noise: float = 0.0
    # data augmentation (training_optimization.py:103-107), 0 = off
    augment_noise: float = 0.0
    augment_shift: float = 0.0
    augment_scale: float = 0.0

    @classmethod
    def from_config(cls, cfg: PiGanConfig, **overrides) -> "StepSettings":
        base = cls(
            adv_w=cfg.loss.adversarial,
            recon_w=cfg.loss.recon,
            physics_spec_w=cfg.loss.physics_spectrum,
            physics_metrics_w=cfg.loss.physics_metrics,
            maxwell_w=cfg.loss.maxwell,
            window_w=cfg.loss.window,
            lc_w=cfg.loss.lc,
            range_w=cfg.loss.param_range,
            kl_w=cfg.loss.bnn_kl,
            detach_forward=cfg.train.detach_forward,
            label_real=cfg.train.label_smooth_real,
            label_fake=cfg.train.label_smooth_fake,
        )
        return dataclasses.replace(base, **overrides)


@dataclass(frozen=True)
class ForwardStepSettings:
    """Forward-surrogate training loss shape.

    Defaults = pretrain_fwd_model.py:81-85 (MSE + MSE).  The constraint
    trainer's phase 1 uses spectrum 5 / metrics 2 / smoothness 0.5
    (unified_constraint_trainer.py:251-255); the emergency trainer adds
    0.5*L1 (emergency_trainer.py:131)."""

    spectrum_w: float = 1.0
    metrics_w: float = 1.0
    smoothness_w: float = 0.0
    l1_w: float = 0.0
    # Heteroscedastic Gaussian NLL on the variance heads of
    # UncertaintyForwardModel (0 = off).  BEYOND the reference: its
    # UncertaintyForwardModel never trains the variance heads (train mode
    # returns means only, enhanced_forward_model.py:258-265); here nll_w > 0
    # adds 0.5*mean(log var + err^2/var) for both heads so the predicted
    # variances become calibrated.  Requires a 4-tuple-returning model.
    nll_w: float = 0.0


# ---------------------------------------------------------------------------
# flax apply helpers
# ---------------------------------------------------------------------------


def _apply(module, mstate: ModelState, *args, train: bool, rng=None, params=None):
    """Apply a module; returns (out, new_extra).  `params` overrides the
    trainable params (for grad closures)."""
    variables = {"params": params if params is not None else mstate.params,
                 **mstate.extra}
    rngs = {"dropout": rng} if rng is not None else None
    mutable = list(mstate.extra.keys()) if train else []
    if train and mutable:
        out, new_extra = module.apply(variables, *args, train=train, rngs=rngs,
                                      mutable=mutable)
        return out, dict(new_extra)
    out = module.apply(variables, *args, train=train, rngs=rngs)
    return out, mstate.extra


# ---------------------------------------------------------------------------
# Forward-surrogate pretrain step
# ---------------------------------------------------------------------------


def make_forward_step(
    model,
    tx: optax.GradientTransformation,
    settings: ForwardStepSettings = ForwardStepSettings(),
) -> Callable[[ForwardState, Batch], tuple[ForwardState, Dict[str, jax.Array]]]:
    """One fused pretrain step (pretrain_fwd_model.py:68-92): forward, loss,
    grad, clip, Adam — a single XLA program.

    The optional third argument `lr_scale` is a *runtime* scalar
    multiplying the final parameter updates — mathematically identical to
    scaling the learning rate, which lets the host-side
    `ReduceLROnPlateau` controller (emergency_trainer.py:131-133 parity)
    drive a compiled schedule without recompiling.  Epoch fns built with
    `with_scale=True` thread their per-epoch scale stream into it."""

    def step(state: ForwardState, batch: Batch, lr_scale=None):
        _, _, params_norm, _, metrics_norm = batch[:5]
        spectra = batch[0]
        rng, k_drop = jax.random.split(state.rng)

        def loss_fn(p):
            out, new_extra = _apply(
                model, state.f, params_norm, train=True, rng=k_drop, params=p
            )
            # output-arity boundary: 2-tuple (spec, met) for the standard
            # variants, 4-tuple (+ variances) for UncertaintyForwardModel —
            # means always lead, so every variant trains here
            pred_spec, pred_met = out[0], out[1]
            spec_l = L.mse(pred_spec, spectra)
            met_l = L.mse(pred_met, metrics_norm)
            total = settings.spectrum_w * spec_l + settings.metrics_w * met_l
            if settings.smoothness_w:
                total = total + settings.smoothness_w * L.maxwell_smoothness_loss(pred_spec)
            if settings.l1_w:
                total = total + settings.l1_w * (
                    L.mae(pred_spec, spectra) + L.mae(pred_met, metrics_norm)
                )
            if settings.nll_w:
                if len(out) < 4:
                    raise ValueError(
                        "ForwardStepSettings.nll_w > 0 needs a model with "
                        "variance heads (forward_model.name='uncertainty')"
                    )
                total = total + settings.nll_w * (
                    L.gaussian_nll(pred_spec, out[2], spectra)
                    + L.gaussian_nll(pred_met, out[3], metrics_norm)
                )
            return total, (new_extra, spec_l, met_l)

        (total, (new_extra, spec_l, met_l)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.f.params)
        updates, new_opt = tx.update(grads, state.opt, state.f.params)
        if lr_scale is not None:
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(state.f.params, updates)
        new_state = ForwardState(
            step=state.step + 1,
            rng=rng,
            f=ModelState(params=new_params, extra=new_extra),
            opt=new_opt,
        )
        metrics = {"loss": total, "spectrum_loss": spec_l, "metrics_loss": met_l}
        return new_state, metrics

    return step


# ---------------------------------------------------------------------------
# Fused PI-GAN step (D update then G update in one program)
# ---------------------------------------------------------------------------


def make_pigan_step(
    generator,
    discriminator,
    forward_model,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    settings: StepSettings,
    param_lo: jax.Array | None = None,
    param_hi: jax.Array | None = None,
    runtime_weights: bool = False,
) -> Callable[..., tuple[PiGanState, Dict[str, jax.Array]]]:
    """Build step(state, batch, constraint_scale=1.0) -> (state, metrics).

    `constraint_scale` is a *dynamic* scalar multiplying the constraint loss
    — the annealing knob of unified_constraint_trainer.py:515-529.

    With `runtime_weights=True` the step signature becomes
    step(state, batch, weights(7,)) where `weights` supplies the seven core
    G-loss weights [adv, recon, physics_spec, physics_metrics, maxwell, lc,
    range] as DYNAMIC values (vmap-able over an ensemble axis — the λ-sweep
    of parallel/ensemble.py) instead of the compile-time StepSettings values.
    """

    def _step(
        state: PiGanState,
        batch: Batch,
        constraint_scale: jax.Array = 1.0,
        loss_weights: jax.Array | None = None,
    ):
        spectra, params_phys, params_norm, _, metrics_norm = batch[:5]
        b = spectra.shape[0]
        lo = param_lo if param_lo is not None else jnp.full((4,), 2.2)
        hi = param_hi if param_hi is not None else jnp.full((4,), 2.8)
        rng, k_gd, k_dd, k_gg, k_dg, k_noise, k_aug, k_in, k_gp = jax.random.split(
            state.rng, 9
        )

        if settings.augment_noise or settings.augment_shift or settings.augment_scale:
            from ..ops.augment import augment_spectra

            spectra = augment_spectra(
                k_aug, spectra,
                noise_level=settings.augment_noise,
                freq_shift=settings.augment_shift,
                amp_scale=settings.augment_scale,
            )

        if loss_weights is None:
            w_adv, w_recon, w_pspec, w_pmet, w_maxwell, w_lc, w_range = (
                settings.adv_w, settings.recon_w, settings.physics_spec_w,
                settings.physics_metrics_w, settings.maxwell_w, settings.lc_w,
                settings.range_w,
            )
        else:
            w_adv, w_recon, w_pspec, w_pmet, w_maxwell, w_lc, w_range = (
                loss_weights[0], loss_weights[1], loss_weights[2],
                loss_weights[3], loss_weights[4], loss_weights[5],
                loss_weights[6],
            )

        def squash(p):
            return jax.nn.sigmoid(p) if settings.sigmoid_squash else p

        # ---- D update (train_pigan.py:123-143) -------------------------
        # fake params from the CURRENT generator, gradient-blocked (.detach)
        fake_norm, _ = _apply(generator, state.g, spectra, train=True, rng=k_gd)
        fake_norm = jax.lax.stop_gradient(squash(fake_norm))
        fake_phys = denormalize_params(fake_norm, lo, hi)

        cat_spec = jnp.concatenate([spectra, spectra], axis=0)
        cat_par = jnp.concatenate([params_phys, fake_phys], axis=0)
        if settings.instance_noise > 0.0:
            cat_spec = cat_spec + settings.instance_noise * jax.random.normal(
                k_in, cat_spec.shape
            )
        labels = jnp.concatenate(
            [
                jnp.full((b, 1), settings.label_real),
                jnp.full((b, 1), settings.label_fake),
            ],
            axis=0,
        )

        def d_loss_fn(dp):
            logits, new_extra = _apply(
                discriminator, state.d, cat_spec, cat_par, train=True, rng=k_dd, params=dp
            )
            if settings.gan_loss == "wgan_gp":
                # Wasserstein critic loss + gradient penalty on interpolated
                # (spectrum, params) inputs; per-row grads are exact because
                # each row of D depends only on its own inputs.
                real_scores, fake_scores = logits[:b], logits[b:]
                eps = jax.random.uniform(k_gp, (b, 1))
                interp_par = eps * params_phys + (1.0 - eps) * fake_phys

                def critic_sum(sp, par):
                    out, _ = _apply(
                        discriminator, state.d, sp, par, train=True,
                        rng=k_dd, params=dp,
                    )
                    return jnp.sum(out)

                g_spec, g_par = jax.grad(critic_sum, argnums=(0, 1))(
                    spectra, interp_par
                )
                grad_norm = jnp.sqrt(
                    jnp.sum(g_spec**2, axis=1) + jnp.sum(g_par**2, axis=1) + 1e-12
                )
                gp = jnp.mean((grad_norm - 1.0) ** 2)
                loss = (
                    jnp.mean(fake_scores)
                    - jnp.mean(real_scores)
                    + settings.gp_weight * gp
                )
            else:
                # reference sums two means -> 2x mean over the concat batch
                loss = 2.0 * L.bce_logits(logits, labels)
            return loss, (new_extra, logits)

        def d_update_branch(_):
            (loss, (extra, logits)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.d.params)
            updates, new_opt = d_tx.update(grads, state.d_opt, state.d.params)
            return (
                optax.apply_updates(state.d.params, updates), new_opt,
                extra, loss, logits,
            )

        def d_skip_branch(_):
            # forward-only: on skipped steps the D backward (and the WGAN-GP
            # inner gradient) must not be paid; the reported d_loss omits the
            # GP term here (metrics-only difference)
            logits, extra = _apply(
                discriminator, state.d, cat_spec, cat_par,
                train=True, rng=k_dd,
            )
            if settings.gan_loss == "wgan_gp":
                loss = jnp.mean(logits[b:]) - jnp.mean(logits[:b])
            else:
                loss = 2.0 * L.bce_logits(logits, labels)
            return state.d.params, state.d_opt, extra, loss, logits

        if settings.d_update_every > 1:
            new_d_params, new_d_opt, new_d_extra, d_loss, d_logits = jax.lax.cond(
                state.step % settings.d_update_every == 0,
                d_update_branch, d_skip_branch, None,
            )
        else:
            new_d_params, new_d_opt, new_d_extra, d_loss, d_logits = (
                d_update_branch(None)
            )
        new_d = ModelState(params=new_d_params, extra=new_d_extra)

        # D accuracy at threshold 0.5 (unified_evaluator.py:315-317)
        probs = jax.nn.sigmoid(d_logits)
        d_acc = 0.5 * (
            jnp.mean((probs[:b] > 0.5).astype(jnp.float32))
            + jnp.mean((probs[b:] <= 0.5).astype(jnp.float32))
        )

        # ---- G update, reading the JUST-UPDATED D (train_pigan.py:145-187)
        def g_loss_fn(gp):
            pred_raw, new_g_extra = _apply(
                generator, state.g, spectra, train=True, rng=k_gg, params=gp
            )
            pred_norm = squash(pred_raw)
            pred_phys = denormalize_params(pred_norm, lo, hi)

            adv_logits, _ = _apply(
                discriminator, new_d, spectra, pred_phys, train=True, rng=k_dg
            )
            if settings.gan_loss == "wgan_gp":
                adv = -jnp.mean(adv_logits)
            else:
                adv = L.bce_logits(adv_logits, jnp.ones((b, 1)))  # unsmoothed 1.0

            # frozen forward surrogate (eval mode — train_pigan.py:75).
            # out[0]/out[1] indexing keeps 4-tuple-returning variants
            # (UncertaintyForwardModel) usable as the frozen F.
            _f_out, _ = _apply(forward_model, state.f, pred_norm, train=False)
            recon_spec, pred_met = _f_out[0], _f_out[1]
            if settings.detach_forward:
                recon_spec = jax.lax.stop_gradient(recon_spec)
                pred_met = jax.lax.stop_gradient(pred_met)

            recon_l = L.mse(recon_spec, spectra)
            met_l = L.mse(pred_met, metrics_norm)
            maxwell_l = L.maxwell_smoothness_loss(recon_spec)
            lc_l = L.lc_approx_loss(pred_met[:, 0:1], pred_met[:, 1:2], pred_norm)
            range_l = L.param_range_loss(pred_norm, settings.range_lo, settings.range_hi)
            kl_l = L.bnn_kl_loss()

            total = (
                w_adv * adv
                + w_recon * recon_l
                + w_pspec * recon_l   # double-count parity
                + w_pmet * met_l
                + w_maxwell * maxwell_l
                + w_lc * lc_l
                + w_range * range_l
                + settings.kl_w * kl_l
            )

            viol = L.violation_rate(pred_norm, settings.range_lo, settings.range_hi)
            aux: Dict[str, jax.Array] = {
                "adv_loss": adv,
                "recon_spec_loss": recon_l,
                "recon_metrics_loss": met_l,
                "maxwell_loss": maxwell_l,
                "lc_loss": lc_l,
                "param_range_loss": range_l,
                "violation_rate": viol,
            }

            if settings.constraint_w:
                ec = L.enhanced_constraint_loss(pred_norm, recon_spec)
                total = total + settings.constraint_w * constraint_scale * ec.loss
                aux["constraint_loss"] = ec.loss
            if settings.window_w:
                total = total + settings.window_w * L.physics_window_loss(
                    recon_spec, spectra, pred_met,
                    consistency_weight=0.0, window_weight=1.0,
                )
            if settings.stability_w:
                noisy = spectra + settings.stability_noise * jax.random.normal(
                    k_noise, spectra.shape
                )
                pred_noisy, _ = _apply(
                    generator, state.g, noisy, train=True, rng=k_gg, params=gp
                )
                total = total + settings.stability_w * L.stability_loss(
                    pred_norm, squash(pred_noisy)
                )
            if settings.cycle_w:
                cycled, _ = _apply(
                    generator, state.g, recon_spec, train=True, rng=k_gg, params=gp
                )
                total = total + settings.cycle_w * L.cycle_consistency_loss(
                    pred_norm, squash(cycled)
                )

            return total, (new_g_extra, aux)

        (g_loss, (g_extra, aux)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g.params)
        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt, state.g.params)
        new_g_params = optax.apply_updates(state.g.params, g_updates)

        if settings.ema_decay > 0.0:
            if state.g_ema is None:
                raise ValueError(
                    "StepSettings.ema_decay > 0 requires a state carrying "
                    "g_ema — init with init_pigan_state(..., ema=True) "
                    "(Trainer does this automatically)"
                )
            mu = settings.ema_decay
            new_g_ema = jax.tree.map(
                lambda e, p: mu * e + (1.0 - mu) * p, state.g_ema, new_g_params
            )
        else:
            new_g_ema = state.g_ema

        new_state = PiGanState(
            step=state.step + 1,
            rng=rng,
            g=ModelState(params=new_g_params, extra=g_extra),
            d=new_d,
            f=state.f,
            g_opt=new_g_opt,
            d_opt=new_d_opt,
            g_ema=new_g_ema,
        )
        metrics = {"d_loss": d_loss, "g_loss": g_loss, "d_accuracy": d_acc, **aux}
        return new_state, metrics

    if runtime_weights:

        def step(state: PiGanState, batch: Batch, weights: jax.Array):
            return _step(state, batch, 1.0, weights)

    else:

        def step(state: PiGanState, batch: Batch, constraint_scale: jax.Array = 1.0):
            return _step(state, batch, constraint_scale)

    return step


# ---------------------------------------------------------------------------
# Epoch-level scan: one compiled program per epoch
# ---------------------------------------------------------------------------


def make_epoch_fn(step_fn, batch_size: int, with_scale: bool = False):
    """Wrap a step into epoch(state, ds, key[, scale]) running all
    minibatches of a shuffled epoch in one `lax.scan`.

    The dataset stays device-resident; each scan iteration gathers its batch
    by index — no host involvement between steps (contrast: the reference's
    DataLoader worker processes + per-batch H2D copies, train_pigan.py:117-121).
    """

    @partial(jax.jit, static_argnames=(), donate_argnums=(0,))
    def epoch(state, ds: ThzDataset, key: jax.Array, scale: jax.Array = 1.0):
        idx = epoch_indices(key, ds.spectra.shape[0], batch_size)

        def body(st, ix):
            batch = gather_batch(ds, ix)
            if with_scale:
                st, m = step_fn(st, batch, scale)
            else:
                st, m = step_fn(st, batch)
            return st, m

        state, ms = jax.lax.scan(body, state, idx)
        return state, jax.tree.map(jnp.mean, ms)

    return epoch


def make_multi_epoch_fn(
    step_fn, batch_size: int, with_scale: bool = False, unroll: int = 3
):
    """Scan E WHOLE EPOCHS inside one jit call:
    multi_epoch(state, ds, key, scales(E,)) -> (state, per-epoch metrics (E, ...)).

    Two wins over calling an epoch fn E times:
    - E× fewer host->device dispatches (the dominant cost at ~3k steps/s,
      and each round trip is a failure opportunity on remote-tunnel setups);
    - XLA sees the epoch boundary, keeping the state resident across epochs.

    `scales` supplies a per-epoch constraint multiplier (annealing); pass
    ones when unused.  E is static per compilation (one compile per distinct
    chunk size — trainers use a fixed chunk and a tail chunk).

    `unroll` unrolls the inner step scan so XLA can overlap adjacent steps'
    independent work (measured +10% steps/s at unroll=3 on v5e-1).
    """

    @partial(jax.jit, donate_argnums=(0,))
    def multi_epoch(state, ds: ThzDataset, key: jax.Array, scales: jax.Array):
        keys = jax.random.split(key, scales.shape[0])

        def epoch_body(st, inputs):
            ekey, scale = inputs
            idx = epoch_indices(ekey, ds.spectra.shape[0], batch_size)

            def body(st, ix):
                batch = gather_batch(ds, ix)
                if with_scale:
                    st, m = step_fn(st, batch, scale)
                else:
                    st, m = step_fn(st, batch)
                return st, m

            st, ms = jax.lax.scan(body, st, idx, unroll=unroll)
            return st, jax.tree.map(jnp.mean, ms)

        state, ms = jax.lax.scan(epoch_body, state, (keys, scales))
        return state, ms

    return multi_epoch

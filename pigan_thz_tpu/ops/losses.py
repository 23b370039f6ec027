"""Loss library as pure, jittable functions.

Reproduces every loss in the reference (cites under /root/reference):
- core/utils/loss.py:8-147 — BCE, MSE, Maxwell-smoothness, LC approximation,
  parameter-range, BNN-KL placeholder;
- core/train/unified_trainer.py:219-267 — constraint / physics-window /
  stability losses;
- core/train/unified_constraint_trainer.py:295-347 — enhanced constraint loss
  with violation-rate, and :869-876 — cycle consistency;
- core/train/emergency_trainer.py:131 — MSE + L1 intensive forward loss.

All functions are stateless and shape-polymorphic; they compose into the
single fused GAN train step (pigan_thz_tpu.train.steps) where XLA fuses them
into the surrounding matmuls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Core GAN losses
# ---------------------------------------------------------------------------


def bce(pred_prob: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Binary cross entropy on probabilities (the reference D ends in Sigmoid
    and uses nn.BCELoss — loss.py:8-17)."""
    p = jnp.clip(pred_prob, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log1p(-p))


def bce_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Numerically-stable BCE on logits; preferred TPU path.  Equivalent to
    sigmoid+BCE and what loss.py's docstring recommends."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def mae(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def gaussian_nll(
    mean: jax.Array, var: jax.Array, target: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """Heteroscedastic Gaussian negative log-likelihood (constant dropped):
    0.5 * mean(log var + (target - mean)^2 / var).  Trains the variance
    heads of UncertaintyForwardModel — a capability the reference declares
    but never trains (enhanced_forward_model.py:224-289 returns means only
    in train mode)."""
    v = var + eps
    return 0.5 * jnp.mean(jnp.log(v) + (target - mean) ** 2 / v)


# ---------------------------------------------------------------------------
# Physics-informed losses
# ---------------------------------------------------------------------------


def maxwell_smoothness_loss(spectrum: jax.Array) -> jax.Array:
    """Mean squared second finite difference of the spectrum — the reference's
    Maxwell-equation proxy (loss.py:29-64).  Returns 0 for <3 points."""
    if spectrum.shape[-1] < 3:
        return jnp.zeros(())
    d1 = spectrum[..., 1:] - spectrum[..., :-1]
    d2 = d1[..., 1:] - d1[..., :-1]
    return jnp.mean(d2**2)


def lc_approx_loss(
    f1_pred_norm: jax.Array,
    f2_pred_norm: jax.Array,
    params_norm: jax.Array,
) -> jax.Array:
    """LC-circuit linear surrogate: f1 ≈ 0.4·r1 + 0.6·w, f2 ≈ 0.3·r2 + 0.7·g
    on normalized values (loss.py:67-101)."""
    r1 = params_norm[:, 0]
    r2 = params_norm[:, 1]
    w = params_norm[:, 2]
    g = params_norm[:, 3]
    th_f1 = 0.4 * r1 + 0.6 * w
    th_f2 = 0.3 * r2 + 0.7 * g
    return mse(jnp.ravel(f1_pred_norm), th_f1) + mse(jnp.ravel(f2_pred_norm), th_f2)


def param_range_loss(params_norm: jax.Array, lo: float = 0.0, hi: float = 1.0) -> jax.Array:
    """Quadratic clamp penalty outside [lo, hi] (loss.py:104-127).  NOTE the
    reference applies this to the generator's *tanh* output (range [-1,1])
    against a [0,1] window — we keep that exact semantics in parity mode; the
    trainers pass lo=-1, hi=1 in 'fixed' mode."""
    below = jnp.clip(lo - params_norm, 0.0, None) ** 2
    above = jnp.clip(params_norm - hi, 0.0, None) ** 2
    return jnp.mean(below + above)


def bnn_kl_loss() -> jax.Array:
    """Placeholder: MC-dropout BNN needs no explicit KL (loss.py:129-147)."""
    return jnp.zeros(())


# ---------------------------------------------------------------------------
# Trainer-level losses (unified / constraint / emergency trainers)
# ---------------------------------------------------------------------------


def constraint_loss(
    params_norm: jax.Array,
    range_penalty_weight: float = 5.0,
    boundary_smoothness: float = 0.1,
) -> jax.Array:
    """ReLU range violation + exponential boundary penalty
    (unified_trainer.py:219-238); operates on [0,1]-normalized params."""
    violation = jnp.sum(jax.nn.relu(params_norm - 1.0) + jax.nn.relu(-params_norm))
    boundary = jnp.sum(
        jnp.exp(-10.0 * params_norm) + jnp.exp(-10.0 * (1.0 - params_norm))
    )
    return range_penalty_weight * violation + boundary_smoothness * boundary


class EnhancedConstraint(NamedTuple):
    loss: jax.Array
    violation_rate: jax.Array


def enhanced_constraint_loss(
    params_norm: jax.Array,
    spectrum_from_forward: jax.Array,
    hard_weight: float = 10.0,
    boundary_weight: float = 0.1,
    smooth_weight: float = 0.05,
    physics_weight: float = 3.0,
) -> EnhancedConstraint:
    """Hard range² + exp(-20·boundary distance) + |Δ params| smoothness +
    forward-model NaN/Inf validity (unified_constraint_trainer.py:295-347).
    Also returns the per-batch violation rate (:344-347)."""
    b = params_norm.shape[0]
    out_of_range = jnp.maximum(
        0.0, jnp.maximum(params_norm - 1.0, -params_norm)
    )
    hard = jnp.sum(out_of_range**2) / b
    boundary_dist = jnp.minimum(params_norm, 1.0 - params_norm)
    # clamp the exponent: params far outside [0,1] (fresh tanh generators
    # reach -1) would otherwise push exp(-20*d) toward overflow in low
    # precision; the hard term already dominates out there.
    boundary = jnp.sum(jnp.exp(jnp.clip(-20.0 * boundary_dist, None, 25.0))) / b
    smooth = jnp.mean(jnp.abs(jnp.diff(params_norm, axis=1)))
    invalid = jnp.isnan(spectrum_from_forward) | jnp.isinf(spectrum_from_forward)
    validity = jnp.sum(invalid.astype(jnp.float32)) / b
    validity = jax.lax.stop_gradient(validity)

    loss = (
        hard_weight * hard
        + boundary_weight * boundary
        + smooth_weight * smooth
        + physics_weight * validity
    )
    violations = jnp.sum((params_norm < 0.0) | (params_norm > 1.0), axis=1)
    rate = jnp.mean((violations > 0).astype(jnp.float32))
    return EnhancedConstraint(loss=loss, violation_rate=jax.lax.stop_gradient(rate))


def physics_window_loss(
    recon_spectrum: jax.Array,
    real_spectrum: jax.Array,
    pred_metrics: jax.Array,
    consistency_weight: float = 5.0,
    window_weight: float = 3.0,
    f_lo: float = 0.5,
    f_hi: float = 3.0,
) -> jax.Array:
    """Forward-consistency MSE + resonance-frequency window penalty on the
    first predicted metric f1 (unified_trainer.py:240-256)."""
    consistency = mse(recon_spectrum, real_spectrum)
    f1 = pred_metrics[:, 0]
    window = jnp.sum(jax.nn.relu(f1 - f_hi) + jax.nn.relu(f_lo - f1))
    return consistency_weight * consistency + window_weight * window


def stability_loss(pred_params: jax.Array, pred_params_noisy: jax.Array) -> jax.Array:
    """Re-prediction drift under input noise (unified_trainer.py:258-267)."""
    return mse(pred_params, pred_params_noisy)


def cycle_consistency_loss(params_first: jax.Array, params_cycled: jax.Array) -> jax.Array:
    """G(F(G(s))) ≈ G(s) (unified_constraint_trainer.py:869-876)."""
    return mse(params_cycled, params_first)


def intensive_forward_loss(
    pred_spectrum: jax.Array,
    real_spectrum: jax.Array,
    pred_metrics: jax.Array,
    real_metrics: jax.Array,
    l1_weight: float = 0.5,
) -> jax.Array:
    """MSE + 0.5·L1 recovery loss for collapsed forward models
    (emergency_trainer.py:131, :162-260)."""
    return (
        mse(pred_spectrum, real_spectrum)
        + mse(pred_metrics, real_metrics)
        + l1_weight * (mae(pred_spectrum, real_spectrum) + mae(pred_metrics, real_metrics))
    )


def violation_rate(params_norm: jax.Array, lo: float = 0.0, hi: float = 1.0) -> jax.Array:
    """Fraction of samples with any parameter outside [lo, hi]
    (unified_evaluator.py:380)."""
    bad = jnp.any((params_norm < lo) | (params_norm > hi), axis=-1)
    return jnp.mean(bad.astype(jnp.float32))

"""Regression/evaluation metric kit as pure JAX functions.

Replaces the sklearn/scipy dependence of the reference evaluator
(core/evaluate/unified_evaluator.py:138-184: MSE/MAE/RMSE/R²/Pearson/MAPE)
with on-device implementations so evaluation runs as one jitted program.
Epsilon semantics match the reference (MAPE adds 1e-8 to the denominator,
unified_evaluator.py:182).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def mse(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean((y_true - y_pred) ** 2)


def mae(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(y_true - y_pred))


def rmse(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.sqrt(mse(y_true, y_pred))


def r2_score(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Coefficient of determination, uniform-averaged over output columns —
    sklearn's default multioutput behaviour, which is what the reference
    evaluator calls (unified_evaluator.py:158)."""
    y_true = y_true.reshape(y_true.shape[0], -1)
    y_pred = y_pred.reshape(y_pred.shape[0], -1)
    return jnp.mean(r2_per_column(y_true, y_pred))


def r2_pooled(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Single pooled R² summing squared errors over ALL elements — the
    reference trainers' in-loop variant (unified_constraint_trainer.py:349-362)."""
    y_true = y_true.reshape(y_true.shape[0], -1)
    y_pred = y_pred.reshape(y_pred.shape[0], -1)
    mean = jnp.mean(y_true, axis=0, keepdims=True)
    tss = jnp.sum((y_true - mean) ** 2)
    rss = jnp.sum((y_true - y_pred) ** 2)
    return 1.0 - rss / jnp.where(tss > 0, tss, 1.0)


def r2_per_column(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Column-wise R² (sklearn multioutput='raw_values').

    Constant-y_true columns follow sklearn's convention: 1.0 when the
    prediction is exact, 0.0 otherwise — previously such columns scored
    `1 - rss` (arbitrarily negative), wrecking the uniform average on
    noise-free data whose clamped spectrum columns are exactly 0 dB."""
    mean = jnp.mean(y_true, axis=0, keepdims=True)
    tss = jnp.sum((y_true - mean) ** 2, axis=0)
    rss = jnp.sum((y_true - y_pred) ** 2, axis=0)
    plain = 1.0 - rss / jnp.where(tss > 0, tss, 1.0)
    degenerate = jnp.where(rss > 0, 0.0, 1.0)
    return jnp.where(tss > 0, plain, degenerate)


def pearson_r(y_true: jax.Array, y_pred: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Mean column-wise Pearson correlation (unified_evaluator.py:163-178)."""
    if y_true.ndim == 1:
        y_true = y_true[:, None]
        y_pred = y_pred[:, None]
    xt = y_true - jnp.mean(y_true, axis=0, keepdims=True)
    yp = y_pred - jnp.mean(y_pred, axis=0, keepdims=True)
    num = jnp.sum(xt * yp, axis=0)
    den = jnp.sqrt(jnp.sum(xt**2, axis=0) * jnp.sum(yp**2, axis=0))
    r = num / jnp.where(den > eps, den, 1.0)
    r = jnp.where(den > eps, r, jnp.nan)
    return jnp.nanmean(r)


def mape(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Percent error with the reference's +1e-8 denominator
    (unified_evaluator.py:182)."""
    return jnp.mean(jnp.abs((y_true - y_pred) / (y_true + 1e-8))) * 100.0


def regression_metrics(y_true: jax.Array, y_pred: jax.Array) -> Dict[str, jax.Array]:
    """The full kit of unified_evaluator.calculate_metrics (:138-184)."""
    m = mse(y_true, y_pred)
    return {
        "mse": m,
        "mae": mae(y_true, y_pred),
        "rmse": jnp.sqrt(m),
        "r2": r2_score(y_true, y_pred),
        "pearson_r": pearson_r(y_true, y_pred),
        "mape": mape(y_true, y_pred),
    }

"""Numerical unit tests for the loss library against hand-computed values
and torch-semantics oracles (the reference has no such tests — SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.ops import losses as L


def test_bce_matches_manual():
    p = jnp.array([[0.9], [0.1]])
    t = jnp.array([[1.0], [0.0]])
    expected = -np.mean([np.log(0.9), np.log(0.9)])
    np.testing.assert_allclose(float(L.bce(p, t)), expected, rtol=1e-4)


def test_bce_logits_equals_bce_on_sigmoid():
    logits = jnp.array([[2.0], [-1.5], [0.3]])
    t = jnp.array([[0.9], [0.1], [1.0]])
    a = float(L.bce(jax.nn.sigmoid(logits), t))
    b = float(L.bce_logits(logits, t))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_maxwell_smoothness_zero_for_line():
    # second difference of a linear ramp is exactly 0 (loss.py:44-56)
    x = jnp.linspace(0.0, 1.0, 50)[None, :]
    assert float(L.maxwell_smoothness_loss(x)) == pytest.approx(0.0, abs=1e-12)


def test_maxwell_smoothness_quadratic():
    # f(i) = i^2 -> second difference = 2 everywhere -> mean square = 4
    i = jnp.arange(10.0)[None, :]
    assert float(L.maxwell_smoothness_loss(i**2)) == pytest.approx(4.0, rel=1e-6)


def test_maxwell_short_spectrum_returns_zero():
    assert float(L.maxwell_smoothness_loss(jnp.ones((2, 2)))) == 0.0


def test_lc_approx_loss_zero_at_exact_relation():
    params = jnp.array([[0.5, 0.2, 0.3, 0.8]])
    f1 = 0.4 * 0.5 + 0.6 * 0.3
    f2 = 0.3 * 0.2 + 0.7 * 0.8
    out = L.lc_approx_loss(jnp.array([[f1]]), jnp.array([[f2]]), params)
    assert float(out) == pytest.approx(0.0, abs=1e-12)


def test_lc_approx_loss_value():
    params = jnp.zeros((1, 4))
    out = L.lc_approx_loss(jnp.array([[1.0]]), jnp.array([[2.0]]), params)
    assert float(out) == pytest.approx(1.0 + 4.0, rel=1e-6)


def test_param_range_loss():
    p = jnp.array([[-0.5, 0.5, 1.5, 1.0]])
    # penalties: 0.25 (below), 0, 0.25 (above), 0 -> mean 0.125 (loss.py:121-127)
    assert float(L.param_range_loss(p)) == pytest.approx(0.125, rel=1e-6)


def test_param_range_loss_custom_window():
    p = jnp.array([[-0.5, 0.5]])
    assert float(L.param_range_loss(p, -1.0, 1.0)) == 0.0


def test_constraint_loss_components():
    p = jnp.array([[0.5, 0.5]])
    # violation = 0; boundary = 2 * 2*exp(-5)
    expected = 0.1 * 4.0 * np.exp(-5.0)
    assert float(L.constraint_loss(p)) == pytest.approx(expected, rel=1e-5)


def test_enhanced_constraint_violation_rate():
    p = jnp.array([[1.5, 0.5], [0.5, 0.5], [-0.1, 0.2], [0.3, 0.4]])
    spec = jnp.zeros((4, 10))
    out = L.enhanced_constraint_loss(p, spec)
    assert float(out.violation_rate) == pytest.approx(0.5)
    assert np.isfinite(float(out.loss))


def test_enhanced_constraint_detects_nan_spectrum():
    p = jnp.full((2, 4), 0.5)
    spec = jnp.array([[jnp.nan, 0.0], [0.0, jnp.inf]])
    out = L.enhanced_constraint_loss(p, spec, physics_weight=1.0)
    clean = L.enhanced_constraint_loss(p, jnp.zeros((2, 2)), physics_weight=1.0)
    assert float(out.loss) > float(clean.loss)


def test_physics_window_loss():
    spec = jnp.zeros((2, 5))
    met = jnp.array([[4.0] + [0.0] * 7, [1.0] + [0.0] * 7])
    # f1=4 -> relu(4-3)=1; f1=1 in window -> 0; consistency=0
    out = L.physics_window_loss(spec, spec, met, consistency_weight=5.0, window_weight=1.0)
    assert float(out) == pytest.approx(1.0, rel=1e-6)


def test_stability_and_cycle_losses():
    a = jnp.ones((3, 4))
    b = jnp.zeros((3, 4))
    assert float(L.stability_loss(a, b)) == 1.0
    assert float(L.cycle_consistency_loss(a, a)) == 0.0


def test_intensive_forward_loss():
    s = jnp.zeros((2, 4))
    m = jnp.zeros((2, 3))
    sp = jnp.ones((2, 4))
    mp = jnp.ones((2, 3))
    # mse 1 + mse 1 + 0.5*(1+1) = 3
    assert float(L.intensive_forward_loss(sp, s, mp, m)) == pytest.approx(3.0)


def test_violation_rate():
    p = jnp.array([[0.5, 1.5], [0.2, 0.3]])
    assert float(L.violation_rate(p)) == pytest.approx(0.5)


def test_all_losses_jittable_and_differentiable():
    key = jax.random.PRNGKey(0)
    spec = jax.random.normal(key, (4, 32))
    params = jax.random.uniform(key, (4, 4))

    def total(s, p):
        return (
            L.maxwell_smoothness_loss(s)
            + L.param_range_loss(p)
            + L.constraint_loss(p)
            + L.enhanced_constraint_loss(p, s).loss
        )

    g = jax.jit(jax.grad(total, argnums=(0, 1)))(spec, params)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)

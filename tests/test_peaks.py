"""Golden tests for the vectorized peak/Q/FoM extraction against a direct
NumPy oracle implementing the reference's sequential algorithm
(data_loader.py:13-58)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.config import DataConfig
from pigan_thz_tpu.data import dip_centers, synthesize_spectra
from pigan_thz_tpu.ops.peaks import (
    batched_peak_metrics,
    find_two_dips,
    peak_parameters,
    spectrum_metrics,
)


def _oracle_fwhm(freq, t, peak_idx, baseline=0.0):
    """Sequential reimplementation of the reference FWHM algorithm."""
    f_res = freq[peak_idx]
    t_min = t[peak_idx]
    half = t_min + (baseline - t_min) / 2
    f_lower = f_upper = np.nan
    for i in range(peak_idx - 1, -1, -1):
        if (t[i] >= half and t[i + 1] < half) or (t[i] < half and t[i + 1] >= half):
            if t[i + 1] != t[i]:
                f_lower = freq[i] + (half - t[i]) * (freq[i + 1] - freq[i]) / (t[i + 1] - t[i])
            else:
                f_lower = freq[i]
            break
    for i in range(peak_idx + 1, len(freq) - 1):
        if (t[i] <= half and t[i + 1] > half) or (t[i] > half and t[i + 1] <= half):
            if t[i + 1] != t[i]:
                f_upper = freq[i] + (half - t[i]) * (freq[i + 1] - freq[i]) / (t[i + 1] - t[i])
            else:
                f_upper = freq[i]
            break
    q = fom = np.nan
    if not np.isnan(f_lower) and not np.isnan(f_upper) and f_upper > f_lower:
        df = f_upper - f_lower
        if df > 1e-9:
            q = f_res / df
        if abs(t_min) > 1e-6 and not np.isnan(q):
            fom = q / abs(t_min)
    return f_res, q, fom


@pytest.fixture(scope="module")
def clean_spectrum():
    cfg = DataConfig()
    params = jnp.array([[2.4, 2.6, 2.5, 2.3]])
    spec = synthesize_spectra(cfg.frequencies, params, key=None, noise_level=0.0)
    return np.asarray(cfg.frequencies), np.asarray(spec[0]), params


def test_find_two_dips_order(clean_spectrum):
    freq, t, params = clean_spectrum
    i1, i2 = find_two_dips(jnp.asarray(t))
    assert int(i1) < int(i2)
    c1, c2 = dip_centers(params)
    assert abs(freq[int(i1)] - float(c1[0])) < 0.05
    assert abs(freq[int(i2)] - float(c2[0])) < 0.05


def test_peak_parameters_match_oracle(clean_spectrum):
    freq, t, _ = clean_spectrum
    i1, i2 = find_two_dips(jnp.asarray(t))
    for idx in (int(i1), int(i2)):
        got = peak_parameters(jnp.asarray(freq), jnp.asarray(t), jnp.asarray(idx))
        f_res, q, fom = _oracle_fwhm(freq, t, idx)
        assert float(got.f_res) == pytest.approx(f_res, rel=1e-6)
        assert float(got.q) == pytest.approx(q, rel=1e-5)
        assert float(got.fom) == pytest.approx(fom, rel=1e-5)


def test_spectrum_metrics_layout(clean_spectrum):
    freq, t, params = clean_spectrum
    m = spectrum_metrics(jnp.asarray(freq), jnp.asarray(t))
    assert m.shape == (8,)
    f1, f2 = float(m[0]), float(m[1])
    assert f1 < f2
    # Q and FoM positive for clean two-dip spectrum
    assert float(m[2]) > 0 and float(m[3]) > 0
    assert float(m[5]) > 0 and float(m[6]) > 0
    # S = f * Q (reference scale constants cancel: (f/1.0)*(Q/100)*100)
    assert float(m[4]) == pytest.approx(f1 * float(m[2]), rel=1e-5)


def test_flat_spectrum_gives_nans_with_fallback():
    freq = jnp.linspace(0.5, 3.0, 100)
    t = jnp.zeros(100)
    m = spectrum_metrics(freq, t, fallback_f1=0.9, fallback_f2=2.1)
    assert float(m[0]) == pytest.approx(0.9)   # fallback centres
    assert float(m[1]) == pytest.approx(2.1)
    assert np.isnan(float(m[2])) and np.isnan(float(m[3]))


def test_batched_matches_single(clean_spectrum):
    freq, t, _ = clean_spectrum
    batch = jnp.stack([jnp.asarray(t)] * 3)
    got = batched_peak_metrics(jnp.asarray(freq), batch)
    single = spectrum_metrics(jnp.asarray(freq), jnp.asarray(t))
    for row in np.asarray(got):
        np.testing.assert_allclose(row, np.asarray(single), rtol=1e-6, equal_nan=True)


def test_single_dip_spectrum():
    freq = jnp.linspace(0.5, 3.0, 250)
    t = -10.0 * jnp.exp(-((freq - 1.5) ** 2) / (2 * 0.1**2))
    m = spectrum_metrics(freq, t)
    assert float(m[0]) == pytest.approx(1.5, abs=0.02)
    assert np.isnan(float(m[1]))  # no second dip
    # analytic FWHM of a Gaussian dip: 2*sqrt(2 ln 2)*sigma
    expected_q = 1.5 / (2.3548 * 0.1)
    assert float(m[2]) == pytest.approx(expected_q, rel=0.05)

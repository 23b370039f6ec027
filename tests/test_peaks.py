"""Golden tests for the vectorized peak/Q/FoM extraction.

Two oracles:
- a direct NumPy reimplementation of the reference's sequential FWHM
  algorithm (data_loader.py:13-58);
- real `scipy.signal.find_peaks(-t, prominence=1.0, width=1)` — the exact
  call the reference makes (data_loader.py:84) — for dip qualification and
  selection parity, exercised on the adversarial spectra classes that
  defeated the pre-round-5 depth-threshold heuristic (noisy baselines near
  threshold, monotone roll-off tails, endpoint dips, plateau bottoms).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import find_peaks

from pigan_thz_tpu.config import DataConfig
from pigan_thz_tpu.data import dip_centers, synthesize_spectra
from pigan_thz_tpu.ops.peaks import (
    batched_peak_metrics,
    dip_qualification,
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


def _scipy_dips(t):
    """The reference's exact qualification call (data_loader.py:84)."""
    idx, _ = find_peaks(-np.asarray(t, np.float64), prominence=1.0, width=1)
    return idx


@pytest.fixture(scope="module")
def clean_spectrum():
    cfg = DataConfig()
    params = jnp.array([[2.4, 2.6, 2.5, 2.3]])
    spec = synthesize_spectra(cfg.frequencies, params, key=None, noise_level=0.0)
    return np.asarray(cfg.frequencies), np.asarray(spec[0]), params


def test_find_two_dips_order(clean_spectrum):
    freq, t, params = clean_spectrum
    i1, i2, has1, has2 = find_two_dips(jnp.asarray(t))
    assert bool(has1) and bool(has2)
    assert int(i1) < int(i2)
    c1, c2 = dip_centers(params)
    assert abs(freq[int(i1)] - float(c1[0])) < 0.05
    assert abs(freq[int(i2)] - float(c2[0])) < 0.05


def test_peak_parameters_match_oracle(clean_spectrum):
    freq, t, _ = clean_spectrum
    i1, i2, _, _ = find_two_dips(jnp.asarray(t))
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


# ---------------------------------------------------------------------------
# scipy find_peaks parity (prominence + width semantics) — round-5 rewrite
# ---------------------------------------------------------------------------


def _assert_scipy_parity(t):
    t = np.asarray(t, np.float32)
    expected = _scipy_dips(t)
    got = np.flatnonzero(np.asarray(dip_qualification(jnp.asarray(t)).qualified))
    np.testing.assert_array_equal(got, expected)


class TestScipyQualificationParity:
    def test_noisy_baseline_near_threshold(self):
        rng = np.random.default_rng(11)
        f = np.linspace(0.5, 3.0, 250)
        for _ in range(40):
            t = -8 * np.exp(-((f - 0.9) ** 2) / (2 * 0.08**2))
            t -= 6 * np.exp(-((f - 2.1) ** 2) / (2 * 0.15**2))
            t += rng.normal(0, 0.45, 250)          # wiggles straddling -1 dB
            _assert_scipy_parity(np.minimum(t, 0))

    def test_monotone_rolloff_has_no_dips(self):
        # the pre-round-5 heuristic registered the tail endpoint as a dip
        rng = np.random.default_rng(5)
        f = np.linspace(0.5, 3.0, 250)
        for _ in range(10):
            t = np.minimum(-3.0 * (f - 0.5) / 2.5 + rng.normal(0, 0.02, 250), 0)
            t = np.minimum.accumulate(t)           # strictly monotone envelope
            _assert_scipy_parity(t)
            assert len(_scipy_dips(t)) == 0

    def test_endpoint_dip_excluded(self):
        f = np.linspace(0.5, 3.0, 250)
        t = np.minimum(-5.0 * np.exp(-((f - 0.5) ** 2) / (2 * 0.05**2)), 0)
        _assert_scipy_parity(t)
        q = dip_qualification(jnp.asarray(t, jnp.float32))
        assert not bool(q.qualified[0]) and not bool(q.qualified[-1])

    def test_plateau_bottom_midpoint(self):
        f = np.linspace(0.5, 3.0, 250)
        t = np.round(-8 * np.exp(-((f - 1.5) ** 2) / (2 * 0.2**2)) * 2) / 2
        _assert_scipy_parity(t)

    def test_random_walks_and_white_noise(self):
        rng = np.random.default_rng(23)
        for trial in range(60):
            if trial % 2:
                t = np.minimum(np.cumsum(rng.normal(0, 0.8, 250)), 0)
            else:
                t = np.minimum(rng.normal(-2.0, 1.5, 250), 0)
            _assert_scipy_parity(t)

    def test_prominence_and_width_values_match_scipy(self):
        from scipy.signal import peak_prominences, peak_widths

        rng = np.random.default_rng(3)
        f = np.linspace(0.5, 3.0, 250)
        t = -8 * np.exp(-((f - 0.9) ** 2) / (2 * 0.08**2)) + rng.normal(0, 0.3, 250)
        t = np.minimum(t, 0).astype(np.float32)
        x = -t.astype(np.float64)
        idx = _scipy_dips(t)
        prom = peak_prominences(x, idx)
        w = peak_widths(x, idx, rel_height=0.5, prominence_data=prom)
        q = dip_qualification(jnp.asarray(t))
        np.testing.assert_allclose(
            np.asarray(q.prominence)[idx], prom[0], rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(q.width)[idx], w[0], rtol=1e-3)


def test_selection_matches_reference_semantics():
    """Dip roles assigned by closeness to the expected centres
    (data_loader.py:91-105), qualified set from scipy."""
    cfg = DataConfig()
    freq = np.asarray(cfg.frequencies)
    key = jax.random.PRNGKey(3)
    params = jax.random.uniform(key, (64, 4), minval=2.2, maxval=2.8)
    spec = np.asarray(
        synthesize_spectra(cfg.frequencies, params, key=jax.random.PRNGKey(9))
    )
    c1s, c2s = (np.asarray(x) for x in dip_centers(params))
    for b in range(spec.shape[0]):
        t = spec[b]
        pk = _scipy_dips(t)
        if len(pk):
            i1 = pk[np.argsort(np.abs(freq[pk] - c1s[b]), kind="stable")][0]
            rem = np.array([i for i in pk if i != i1])
            i2 = (
                rem[np.argsort(np.abs(freq[rem] - c2s[b]), kind="stable")][0]
                if len(rem)
                else None
            )
        else:
            i1 = i2 = None
        j1, j2, h1, h2 = find_two_dips(
            jnp.asarray(t),
            freq=cfg.frequencies,
            centers=(jnp.float32(c1s[b]), jnp.float32(c2s[b])),
        )
        assert (i1 is None) == (not bool(h1))
        assert (i2 is None) == (not bool(h2))
        if i1 is not None:
            assert int(j1) == i1
        if i2 is not None:
            assert int(j2) == i2


def test_degenerate_spectra_score_invalid_for_screening():
    """Monotone roll-off spectra (common degenerate generator output early in
    training) must produce NaN f1 → -inf screening scores, keeping them out
    of top-k candidate lists (VERDICT r4 Weak #4)."""
    from pigan_thz_tpu.design.screening import _score

    f = np.linspace(0.5, 3.0, 250)
    rolloff = np.minimum.accumulate(
        np.minimum(-3.0 * (f - 0.5) / 2.5, 0)
    ).astype(np.float32)
    batch = jnp.stack([jnp.asarray(rolloff)] * 4)
    metrics = batched_peak_metrics(jnp.asarray(f, jnp.float32), batch)
    assert np.all(np.isnan(np.asarray(metrics)[:, 0]))  # f1 NaN, no fallback
    scores = _score(metrics, "FoM1")
    assert np.all(np.asarray(scores) == -np.inf)
    scores2 = _score(metrics, "FoM1+FoM2")
    assert np.all(np.asarray(scores2) == -np.inf)


def test_pallas_batch_matches_dense_oracle():
    """The Pallas batch path (interpret mode here; the TPU production
    route for screening-scale batches) must agree with the per-spectrum
    XLA lattice on qualification, and on prominence/width AT PEAKS
    (non-peak rows are don't-care by contract).  Exercises N padding to
    the 128-lane multiple and B padding to the tile."""
    from pigan_thz_tpu.ops.peaks import batched_dip_qualification

    rng = np.random.default_rng(99)
    for n in (250, 199, 64):
        rows = []
        for trial in range(11):        # 11: forces batch padding (tile=8)
            if trial % 3 == 0:
                t = np.minimum(np.cumsum(rng.normal(0, 0.8, n)), 0)
            elif trial % 3 == 1:
                t = np.round(np.minimum(rng.normal(-2, 1.5, n), 0) * 2) / 2
            else:
                t = np.minimum(rng.normal(-1.0, 0.6, n), 0)
            rows.append(t)
        batch = jnp.asarray(np.stack(rows), jnp.float32)
        a = batched_dip_qualification(batch, interpret=True)
        b = jax.vmap(dip_qualification)(batch)
        np.testing.assert_array_equal(
            np.asarray(a.qualified), np.asarray(b.qualified)
        )
        np.testing.assert_array_equal(
            np.asarray(a.is_peak), np.asarray(b.is_peak)
        )
        pk = np.asarray(b.is_peak)
        np.testing.assert_allclose(
            np.asarray(a.prominence)[pk], np.asarray(b.prominence)[pk],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(a.width)[pk], np.asarray(b.width)[pk], rtol=1e-5
        )


def test_quantized_spectra_parity_modulo_threshold_ulps():
    """Quantized spectra (rounded real exports) generate knife-edge dips
    whose fp64 width/prominence sits exactly ON the filter threshold
    (e.g. width 1 + 4e-16).  fp32 cannot decide those; every OTHER dip
    must still agree exactly with scipy (review r5: the earlier 'exact'
    claim hid this class because the fixed fuzz seeds missed it)."""
    from scipy.signal import peak_prominences, peak_widths

    rng = np.random.default_rng(7)
    checked = disagreements = 0
    for trial in range(400):
        t = np.minimum(rng.normal(-2, 1.5, 250), 0)
        t = (np.round(t * 2) / 2).astype(np.float32)     # 0.5-dB quantized
        x64 = -t.astype(np.float64)
        sp, _ = find_peaks(x64, prominence=1.0, width=1)
        ours = set(np.flatnonzero(
            np.asarray(dip_qualification(jnp.asarray(t)).qualified)
        ).tolist())
        # all local maxima with their fp64 measures, to classify diffs
        from scipy.signal import argrelextrema  # noqa: F401 (doc only)
        for idx in set(sp.tolist()) ^ ours:
            prom = peak_prominences(x64, [idx])
            w = peak_widths(x64, [idx], rel_height=0.5,
                            prominence_data=prom)[0][0]
            near_thr = (
                abs(prom[0][0] - 1.0) < 1e-5 or abs(w - 1.0) < 1e-5
            )
            assert near_thr, (
                f"trial {trial}: dip {idx} disagrees with scipy but its "
                f"fp64 prominence {prom[0][0]} / width {w} is NOT at a "
                "filter threshold — that would be a semantics bug, not "
                "fp32 rounding"
            )
            disagreements += 1
        checked += 1
    assert checked == 400

    # deterministic knife-edge instance (review r5 repro): the dip at
    # index 4 has fp64 width EXACTLY 1.0 — scipy qualifies it, fp32
    # rounds the interpolation to 0.99999976 and drops it.  Pin that the
    # divergence class exists and is confined to the threshold boundary.
    t = np.array([-5, -2.5, 0, 0, -3, -1.5, -1, -5] + [0] * 242, np.float32)
    x64 = -t.astype(np.float64)
    sp = set(_scipy_dips(t).tolist())
    ours = set(np.flatnonzero(
        np.asarray(dip_qualification(jnp.asarray(t)).qualified)
    ).tolist())
    assert sp - ours == {4} and ours <= sp
    w4 = peak_widths(x64, [4], rel_height=0.5,
                     prominence_data=peak_prominences(x64, [4]))[0][0]
    assert abs(w4 - 1.0) < 1e-9      # exactly at the width threshold

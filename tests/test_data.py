"""Data pipeline tests: synthesis, normalization semantics, CSV contract.

Mirrors and extends the reference's data checks (quick_test.py:12-45 schema
check, test_data_loading.py:15-58 shape check) with numerical golden tests
the reference lacks (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.config import DataConfig, METRIC_NAMES, PARAM_NAMES
from pigan_thz_tpu.data import (
    denormalize_metrics,
    denormalize_params,
    dip_centers,
    epoch_indices,
    gather_batch,
    load_csv,
    metric_ranges_from_data,
    normalize_metrics,
    normalize_params,
    normalize_spectrum,
    save_csv,
    synthesize_spectra,
    synthetic_dataset,
)


def test_dataset_shapes(small_ds, cfg):
    n, s = cfg.data.num_samples, cfg.data.spectrum_dim
    assert small_ds.spectra.shape == (n, s)
    assert small_ds.params.shape == (n, 4)
    assert small_ds.params_norm.shape == (n, 4)
    assert small_ds.metrics.shape == (n, 8)
    assert small_ds.metrics_norm.shape == (n, 8)


def test_spectra_physical(small_ds):
    # transmission in dB clamped at 0 (data_loader.py:80)
    assert float(jnp.max(small_ds.spectra)) <= 0.0
    assert bool(jnp.all(jnp.isfinite(small_ds.spectra)))


def test_params_norm_range(small_ds):
    # [-1, 1] normalization (data_loader.py:193-194)
    assert float(jnp.min(small_ds.params_norm)) >= -1.0
    assert float(jnp.max(small_ds.params_norm)) <= 1.0


def test_param_roundtrip(small_ds):
    phys = denormalize_params(small_ds.params_norm, small_ds.param_lo, small_ds.param_hi)
    np.testing.assert_allclose(np.asarray(phys), np.asarray(small_ds.params), rtol=1e-5)


def test_metric_normalization_nan_policy():
    m = jnp.array([[1.0, jnp.nan], [3.0, jnp.nan], [2.0, jnp.nan]])
    lo, hi = metric_ranges_from_data(m)
    # all-NaN column gets default range (0, 1)  (data_loader.py:207-208)
    assert float(lo[1]) == 0.0 and float(hi[1]) == 1.0
    norm = normalize_metrics(m, lo, hi)
    # NaN -> 0.5 (data_loader.py:219)
    np.testing.assert_allclose(np.asarray(norm[:, 1]), 0.5)
    np.testing.assert_allclose(np.asarray(norm[:, 0]), [0.0, 1.0, 0.5])


def test_metric_denorm_nan_to_zero():
    lo = jnp.array([1.0])
    hi = jnp.array([3.0])
    out = denormalize_metrics(jnp.array([[jnp.nan]]), lo, hi)
    # NaN -> 0.0 after denorm (data_loader.py:291)
    assert float(out[0, 0]) == 0.0


def test_zero_span_denorm_maps_to_lo():
    lo = jnp.array([2.0])
    hi = jnp.array([2.0])
    out = denormalize_metrics(jnp.array([[0.7]]), lo, hi)
    assert float(out[0, 0]) == 2.0


def test_normalize_spectrum_clip_and_constant():
    x = jnp.array([-10.0, -5.0, 0.0])
    out = normalize_spectrum(x)
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.5, 1.0])
    const = normalize_spectrum(jnp.full((4,), -3.0))
    np.testing.assert_allclose(np.asarray(const), 0.5)  # data_loader.py:325
    clipped = normalize_spectrum(x, global_min=-5.0, global_max=0.0)
    assert float(clipped.min()) == 0.0  # clamped (data_loader.py:328)


def test_synthetic_dip_positions():
    """Golden: noise-free spectrum of the centred cell has dips at the
    analytic centre frequencies (data_loader.py:64,69)."""
    cfg = DataConfig()
    params = jnp.full((1, 4), 2.5)
    spec = synthesize_spectra(cfg.frequencies, params, key=None, noise_level=0.0)
    c1, c2 = dip_centers(params)
    freq = np.asarray(cfg.frequencies)
    t = np.asarray(spec[0])
    # dip 1 near 0.870, dip 2 near 2.115
    w = 20
    i1 = np.argmin(np.abs(freq - float(c1[0])))
    i2 = np.argmin(np.abs(freq - float(c2[0])))
    assert abs(np.argmin(t[i1 - w : i1 + w]) + i1 - w - i1) <= 2
    assert abs(np.argmin(t[i2 - w : i2 + w]) + i2 - w - i2) <= 2


def test_csv_roundtrip(tmp_path, small_ds, cfg):
    path = str(tmp_path / "thz.csv")
    save_csv(small_ds, path)
    # schema contract: Freq_* + params + metrics columns (quick_test.py:12-45)
    import pandas as pd

    df = pd.read_csv(path)
    freq_cols = [c for c in df.columns if c.startswith("Freq_")]
    assert len(freq_cols) == cfg.data.spectrum_dim
    for col in (*PARAM_NAMES, *METRIC_NAMES):
        assert col in df.columns
    ds2 = load_csv(path, cfg.data)
    np.testing.assert_allclose(
        np.asarray(ds2.spectra), np.asarray(small_ds.spectra), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ds2.params_norm), np.asarray(small_ds.params_norm), atol=1e-5
    )


def test_epoch_indices_cover_and_shape():
    idx = epoch_indices(jax.random.PRNGKey(0), 100, 32)
    assert idx.shape == (3, 32)
    assert int(idx.max()) < 100
    # a permutation prefix: no duplicate within the first 96
    flat = np.asarray(idx).ravel()[:96]
    assert len(set(flat.tolist())) == 96


def test_gather_batch(small_ds):
    idx = jnp.arange(8)
    spec, par, parn, met, metn = gather_batch(small_ds, idx)
    assert spec.shape == (8, small_ds.spectrum_dim)
    assert parn.shape == (8, 4)


def test_split_dataset(small_ds):
    from pigan_thz_tpu.data import split_dataset
    import jax

    train, val = split_dataset(small_ds, val_frac=0.25, key=jax.random.PRNGKey(3))
    assert val.num_samples == round(small_ds.num_samples * 0.25)
    assert train.num_samples + val.num_samples == small_ds.num_samples
    # shared normalization statistics
    np.testing.assert_array_equal(np.asarray(train.metric_lo), np.asarray(val.metric_lo))
    # disjoint rows: no spectrum appears in both splits
    tr = {tuple(np.round(r, 5)) for r in np.asarray(train.spectra[:, :8])}
    va = {tuple(np.round(r, 5)) for r in np.asarray(val.spectra[:, :8])}
    assert not (tr & va)


def test_epoch_indices_tiny_dataset_wraps_by_tiling():
    """Datasets smaller than half the batch still fill one static batch
    (review r4: a single concat could only extend by num_samples, so
    n < batch/2 crashed the reshape at trace time)."""
    import jax

    from pigan_thz_tpu.data.dataset import epoch_indices

    for n in (3, 10, 30, 63):
        idx = epoch_indices(jax.random.PRNGKey(0), n, 64)
        assert idx.shape == (1, 64)
        assert int(idx.max()) < n and int(idx.min()) >= 0
